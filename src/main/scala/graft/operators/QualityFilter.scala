package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Document quality scoring + filtering — the standard pre-training corpus
  * gate (length bounds, alphabetic ratio, stopword density). Pure map-side
  * column arithmetic: at 100 TB this runs inside the scan's whole-stage
  * codegen with zero shuffles, and the filter prunes downstream volume
  * before any expensive dedup/similarity stage.
  */
object QualityFilter {

  final case class Thresholds(
      minTokens: Long = 20,
      maxTokens: Long = 1 << 20,
      minAlphaRatio: Double = 0.6,
      minStopRatio: Double = 0.01)

  /** Adds n_tokens / n_chars / n_letters / n_stopwords / alpha_ratio /
    * stop_ratio / quality_score columns (deterministic arithmetic). */
  def scored(docs: DataFrame, textCol: String = "text",
      stopwords: Seq[String] = Seq("the", "a", "of", "and", "in", "to")): DataFrame =
    docs
      .withColumn("toks", Text.tokens(col(textCol)))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_chars", length(col(textCol)).cast("long"))
      .withColumn("n_letters", Text.letterCount(col(textCol)))
      .withColumn("n_stopwords", Text.vocabHits("toks", stopwords))
      .withColumn("alpha_ratio", col("n_letters") / col("n_chars").cast("double"))
      .withColumn("stop_ratio", col("n_stopwords") / col("n_tokens").cast("double"))
      .withColumn("quality_score", col("alpha_ratio") * 0.5 + col("stop_ratio") * 0.5)
      .drop("toks")

  /** Rows passing the thresholds, with a `keep` verdict retained for audit. */
  def verdicts(docs: DataFrame, t: Thresholds = Thresholds()): DataFrame =
    scored(docs).withColumn("keep",
      col("n_tokens") >= t.minTokens && col("n_tokens") <= t.maxTokens &&
        col("alpha_ratio") >= t.minAlphaRatio && col("stop_ratio") >= t.minStopRatio)

  def filter(docs: DataFrame, t: Thresholds = Thresholds()): DataFrame =
    verdicts(docs, t).filter(col("keep")).drop("keep")
}
