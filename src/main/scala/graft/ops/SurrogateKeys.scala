package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** W2: surrogate-key assignment replacing Redshift `IDENTITY(1,1)`
  * (dynamic_upsert.py:17-19; consumed at populate_fact.py:118).
  *
  * The keys the reference generates are dense 1..N integers in insert order.
  * `monotonically_increasing_id()` is NOT a valid substitute (non-dense,
  * partition-layout-dependent → non-deterministic across runs), so:
  *
  *  - [[assign]]: `row_number()` over a global order on the business key +
  *    an offset for already-issued keys. Deterministic and dense, but the
  *    window has a single-partition sort — fine for dimension tables (the only
  *    place the reference needs identity keys; dims are small relative to
  *    facts).
  *  - [[assignScalable]]: for a dimension that is itself huge, a two-phase
  *    sort + `zipWithIndex` that keeps the data distributed: sort by the key
  *    (range-partitioned, parallel), count rows per partition (one small job),
  *    then add each partition's prefix-sum offset. Same dense result, no
  *    single-partition bottleneck.
  */
object SurrogateKeys {

  /** Dense keys offset+1..offset+N ordered by `orderCols`. */
  def assign(df: DataFrame, keyCol: String, offset: Long, orderCols: String*): DataFrame = {
    val order = if (orderCols.isEmpty) df.columns.toSeq else orderCols
    val w = Window.orderBy(order.map(col): _*)
    df.withColumn(keyCol, (row_number().over(w).cast(LongType) + lit(offset)))
  }

  /** Scalable variant: dense keys without a single-partition window. */
  def assignScalable(df: DataFrame, keyCol: String, offset: Long, orderCols: String*): DataFrame = {
    val order = if (orderCols.isEmpty) df.columns.toSeq else orderCols
    val sorted = df.repartitionByRange(order.map(col): _*).sortWithinPartitions(order.map(col): _*)
    val schema = sorted.schema
    val indexed = sorted.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (i + 1 + offset))
    }
    df.sparkSession.createDataFrame(indexed,
      schema.add(keyCol, LongType, nullable = false))
  }

  /** Max issued key in an existing dimension (0 when empty), the `IDENTITY`
    * high-water mark for the next load. */
  def maxKey(dim: DataFrame, keyCol: String): Long = {
    val r = dim.agg(max(col(keyCol).cast(LongType))).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }
}
