package graft
import org.apache.spark.sql.SparkSession

/** Scratch dev main for performance probing (not part of the contract).
  * Usage: DevProbe <sfDir> <queryName>... — times each named gate query
  * (best of 3) under the same session confs as Bench. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q_x_pagerank")
    val spark = SparkSession.builder()
      .withExtensions(new graft.extensions.GraftExtensions).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.locality.wait", "0")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label: $s%.2fs"); s
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      val ts = (1 to 3).map(i => time(s"$n run$i")(fn(spark, sfDir).count()))
      spark.catalog.clearCache()
      println(f"[probe] $n best: ${ts.min}%.2fs")
    }
  }
}
