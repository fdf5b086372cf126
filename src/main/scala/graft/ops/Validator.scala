package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.model.TableSpec

/** C1 validation (validate_data.py:40-86): NOT NULL check on every column and
  * primary-key uniqueness, raising on the first violation.
  *
  * The reference issues N+1 full-table scans — one `SELECT COUNT(*) WHERE col
  * IS NULL` per column (validate_data.py:69-71) plus one `GROUP BY pk HAVING
  * COUNT(*) > 1` (validate_data.py:79-81). At 100 TB that is N+1 reads of the
  * table; this engine collapses all null counts into ONE aggregate pass
  * (`count(when(isnull(c),1))` per column in a single `select`), and the
  * duplicate scan into one hash aggregate, so validation is exactly two jobs
  * regardless of column count — and the null pass is a single stage with no
  * shuffle (global aggregate of 32/1000 partial rows).
  */
object Validator {

  final case class ValidationResult(
      table: String,
      rowCount: Long,
      nullViolations: Map[String, Long],  // column -> null count (only >0 entries)
      duplicateKeys: Long,                // number of distinct PK values appearing >1 time
      lengthViolations: Map[String, Long] = Map.empty // column -> over-VARCHAR-width count
  ) {
    def ok: Boolean = nullViolations.isEmpty && duplicateKeys == 0 && lengthViolations.isEmpty
  }

  /** Raised with the same message semantics as validate_data.py:74 ("Not Null
    * constraints violation") and :85 (duplicate key). */
  final class ValidationException(msg: String) extends RuntimeException(msg)

  /** ANALYZE-style column statistics: per column the min/max (rendered
    * through each engine's canonical string cast — avoid float columns,
    * whose text formats differ), NULL count, and EXACT distinct count. The
    * optimizer-stats surface of a warehouse (NDVs feed join sizing, min/max
    * feed zone-map pruning).
    *
    * Shape: one SINGLE-distinct aggregate job per column, submitted
    * concurrently. k exact count_distincts in one aggregate would trigger
    * Spark's Expand rewrite — (k+1)× row duplication through the first
    * aggregate — whereas a lone distinct column plans as a partial
    * aggregate keyed on the value (map-side dedup, no duplication), and
    * each job's scan is column-pruned to exactly its one column, so total
    * bytes read equal the single wide scan. Concurrent scheduling makes
    * wall-time ≈ one column; on a cluster the jobs share executors the
    * same way. Swap in approx_count_distinct when ±2% NDVs are acceptable
    * at the 100 TB tier. Output: one row per column (column_name, n_rows,
    * min_value, max_value, n_nulls, n_distinct). */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val spark = df.sparkSession
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(cols.size max 1, 8))
    val ec = ExecutionContext.fromExecutorService(pool)
    val out = try {
      val futures = cols.map { c =>
        Future {
          val r = df.select(col(c)).agg(
            count(lit(1)).as("n"),
            min(col(c)).cast("string").as("mn"),
            max(col(c)).cast("string").as("mx"),
            count(when(col(c).isNull, 1)).as("nulls"),
            count_distinct(col(c)).as("ndv")).head()
          Row(c, r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4))
        }(ec)
      }
      futures.map(Await.result(_, Duration.Inf))
    } finally pool.shutdown()
    spark.createDataFrame(java.util.Arrays.asList(out: _*),
      StructType(Seq(StructField("column_name", StringType),
        StructField("n_rows", LongType), StructField("min_value", StringType),
        StructField("max_value", StringType), StructField("n_nulls", LongType),
        StructField("n_distinct", LongType))))
  }

  /** Single-pass null counts for `cols` (A1). One row out, no shuffle. */
  def nullCounts(df: DataFrame, cols: Seq[String]): Map[String, Long] = {
    if (cols.isEmpty) return Map.empty
    val aggs: Seq[Column] =
      count(lit(1)).as("__rows") +: cols.map(c => count(when(col(c).isNull, 1)).as(c))
    val row: Row = df.select(aggs: _*).head()
    cols.zipWithIndex.map { case (c, i) => c -> row.getLong(i + 1) }.toMap
  }

  /** A2: distinct PK values that occur more than once. */
  def duplicateKeys(df: DataFrame, pk: Seq[String]): DataFrame =
    df.groupBy(pk.map(col): _*).count().filter(col("count") > 1)

  /** Full C1 check. Caches the input because it feeds two jobs (SURVEY.md §4).
    * Set `failFast=true` for the reference's raise-on-violation behavior.
    *
    * One aggregate pass carries the row count, every null count, AND every
    * VARCHAR over-width count (the width the reference's DDL would have
    * enforced at COPY time, dynamic_upsert.py:17-26) — validation stays
    * exactly two jobs no matter how many constraints the spec declares. */
  def validate(df: DataFrame, spec: TableSpec, failFast: Boolean = false): ValidationResult = {
    val cached = df.cache()
    try {
      val present = cached.columns.map(_.toLowerCase).toSet
      val checkCols = spec.columnNames.filter(c => present.contains(c.toLowerCase))
      val lenCols = spec.lengthColumns.filter { case (c, _) => present.contains(c.toLowerCase) }
      val aggs: Seq[Column] =
        (count(lit(1)).as("__rows") +:
          checkCols.map(c => count(when(col(c).isNull, 1)).as(s"__null_$c"))) ++
          lenCols.map { case (c, n) => count(when(length(col(c)) > n, 1)).as(s"__len_$c") }
      val row: Row = cached.select(aggs: _*).head()
      val rowCount = row.getLong(0)
      val nulls = checkCols.zipWithIndex
        .map { case (c, i) => c -> row.getLong(i + 1) }.filter(_._2 > 0).toMap
      val lens = lenCols.zipWithIndex
        .map { case ((c, _), i) => c -> row.getLong(i + 1 + checkCols.length) }
        .filter(_._2 > 0).toMap
      if (failFast && nulls.nonEmpty)
        throw new ValidationException(
          s"Not Null constraints violation in table ${spec.name}: " +
            nulls.keys.toSeq.sorted.mkString(", "))
      if (failFast && lens.nonEmpty)
        throw new ValidationException(
          s"Value exceeds declared VARCHAR length in table ${spec.name}: " +
            lens.keys.toSeq.sorted.mkString(", "))
      val dups =
        if (spec.primaryKey.nonEmpty) duplicateKeys(cached, spec.primaryKey).count() else 0L
      if (failFast && dups > 0)
        throw new ValidationException(
          s"Duplicate values found in column(s) ${spec.primaryKey.mkString(",")} " +
            s"of table ${spec.name}")
      ValidationResult(spec.name, rowCount, nulls, dups, lens)
    } finally cached.unpersist()
  }
}
