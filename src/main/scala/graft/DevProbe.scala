package graft
import org.apache.spark.sql.SparkSession

/** Scratch dev main for performance probing (not part of the contract). */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new graft.extensions.GraftExtensions).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val hf = graft.operators.TextIndex.hashFeatures(docs, "doc_id", "text", 256)
    time("hash_features run1")(hf.count())
    time("hash_features run2")(hf.count())
    time("hash_features run3")(hf.count())
    val tb = docs.selectExpr("doc_id",
      "size(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]+', 0)) AS n")
    time("token_bpe run1")(tb.count())
    time("token_bpe run2")(tb.count())
  }
}
