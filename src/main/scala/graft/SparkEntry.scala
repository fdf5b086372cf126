package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 (plus the training-data-pipeline
  * extensions) is exposed as a named query over the driver test tables, with
  * a DuckDB oracle where the op is SQL-expressible. The query definitions
  * live beside their oracles in [[graft.queries]].
  */
object SparkEntry {

  val allQueries: Seq[QueryDef] =
    ParityQueries.all ++ TextQueries.all ++ VectorQueries.all ++
      EventQueries.all ++ RetrievalQueries.all ++ GraphQueries.all ++
      CurationQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_c3_fact_build")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
