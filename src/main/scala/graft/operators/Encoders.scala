package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Categorical feature encoders for model-training tables. The classic
  * leakage trap in target encoding is including a row's OWN target in its
  * category statistic — the encoded feature then memorizes the label and
  * validation scores collapse in production. The leave-one-out form here
  * excludes self by construction.
  */
object Encoders {

  /** Leave-one-out target encoding of `catCol` against an integer target:
    * each row gets (Σ target over its category − its own target) /
    * (n_category − 1) — the category's mean target computed WITHOUT the
    * row itself. NULL for singleton categories (no peers to average; a
    * fallback to the global mean is a caller-side `coalesce`).
    *
    * Exactness: numerator and denominator are exact BIGINTs (the target
    * must be integer-valued — cents, counts); the encoding is ONE IEEE
    * division per row, bit-identical cross-engine. Shape: one
    * category-keyed aggregate (category-cardinality-sized) broadcast back
    * onto the rows — no window over the full table, no self-join; the same
    * two-scan silhouette as the quantile machinery at any table size. */
  def targetEncodeLoo(df: DataFrame, catCol: String, targetCol: String): DataFrame = {
    val stats = df.groupBy(col(catCol))
      .agg(sum(col(targetCol)).as("__cat_sum"), count(col(targetCol)).as("__cat_n"))
    df.join(broadcast(stats), Seq(catCol), "left")
      .withColumn("loo_mean",
        when(col("__cat_n") > 1 && col(targetCol).isNotNull,
          (col("__cat_sum") - col(targetCol)).cast("double") /
            (col("__cat_n") - 1).cast("double")))
      .drop("__cat_sum", "__cat_n")
  }
}
