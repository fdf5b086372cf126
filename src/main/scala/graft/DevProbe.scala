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
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    time("prepared.count")(graft.operators.VectorSearch.prepared(emb).count())
    val buck = graft.operators.VectorSearch.lshBuckets(emb)
    time("plan lshBuckets")(buck.queryExecution.executedPlan)
    time("lshBuckets.count run1")(buck.count())
    time("lshBuckets.count run2")(buck.count())
    val nd = graft.operators.VectorSearch.nearDuplicates(emb, 0.3)
    time("nearDuplicates run1")(nd.count())
    time("nearDuplicates run2")(nd.count())
    val mh = graft.operators.TextDedup.minhashLsh(spark.read.parquet(s"$sfDir/documents.parquet"), 0.5)
    time("minhash run1")(mh.count())
    time("minhash run2")(mh.count())
    val sh = graft.operators.TextDedup.simhashNearDups(spark.read.parquet(s"$sfDir/documents.parquet"), 11)
    time("simhash_nd run1")(sh.count())
    time("simhash_nd run2")(sh.count())
    time("simhash_nd run3")(sh.count())
    time("clusters run1")(graft.operators.TextDedup.clusters(
      graft.operators.TextDedup.ngramJaccard(spark.read.parquet(s"$sfDir/documents.parquet"), 0.5)).count())
    time("clusters run2")(graft.operators.TextDedup.clusters(
      graft.operators.TextDedup.ngramJaccard(spark.read.parquet(s"$sfDir/documents.parquet"), 0.5)).count())
    spark.stop()
  }
}
