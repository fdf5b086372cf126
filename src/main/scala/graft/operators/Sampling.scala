package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Training-data selection operators: deterministic sampling and per-group
  * quota ("data mixing") selection.
  *
  * Both are built for reproducibility at corpus scale: selection is a pure
  * function of document identity (portable md5-derived hash), never of
  * partition layout or RNG state — re-running the pipeline on a re-shuffled
  * 100 TB corpus selects exactly the same documents. `sample()`/`rand()`
  * cannot promise that (seeded per-partition), so they are deliberately not
  * used.
  */
object Sampling {

  /** Deterministic hash bucket in [0, buckets) from a key column. */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    Hashing.hash64(key.cast("string")) % buckets

  /** Keep `pct`% of rows, chosen by hash bucket of `keyCol` — stable across
    * runs, partitionings, and engines; map-side only (rides the scan). */
  def hashSample(df: DataFrame, keyCol: String, pct: Int, buckets: Int = 100): DataFrame =
    df.filter(hashBucket(col(keyCol), buckets) < pct * buckets / 100)

  /** Top-`k` rows per group by (scoreCol desc, keyCol) — the quota/mixing
    * step of a training-data pipeline (e.g. best N documents per language or
    * per source). One shuffle on the group key; Spark's WindowGroupLimit
    * turns the rank filter into a per-partition top-k before the merge, so
    * no group ever materializes fully. */
  def quotaPerGroup(df: DataFrame, groupCol: String, scoreCol: String, k: Int,
      keyCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(scoreCol).desc, col(keyCol))
    df.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= k)
  }
}
