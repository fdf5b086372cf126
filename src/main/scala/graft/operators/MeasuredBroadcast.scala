package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-aware gate for MEASURED broadcast hints on string-keyed build sides.
  *
  * A row-count cutoff alone is sound only for fixed-width keys (the
  * [[Trend.spearman]] rank maps: two longs, rows × 16 B tracks bytes within
  * a constant). For STRING-keyed vocab/df frames, a near-cutoff vocabulary
  * of long tokens can hide a multi-hundred-MB relation behind a "2M rows"
  * check — and an explicit `broadcast()` hint BYPASSES
  * autoBroadcastJoinThreshold, so the planner never saves us. This gate
  * estimates the hashed-relation footprint from the same one measuring job
  * the row cutoff already paid for: rows × [[RowOverheadBytes]] (UnsafeRow
  * header + fixed columns + hash-table entry) + 2 × total key bytes
  * (UTF8String payload, ×2 slack for non-ASCII and copies). Past either
  * bound the caller falls back to the key-keyed shuffle join — the 100 TB
  * web-vocab shape anyway. */
object MeasuredBroadcast {
  val MaxRows: Long = 2000000L
  val MaxBytes: Long = 64L << 20
  val RowOverheadBytes: Long = 48L

  /** Decision from an already-measured (rows, total key bytes) pair — use
    * when the caller's existing aggregate can carry `sum(length(key))` for
    * free. */
  def fits(rows: Long, keyBytes: Long, maxRows: Long = MaxRows,
      maxBytes: Long = MaxBytes): Boolean =
    rows <= maxRows && rows * RowOverheadBytes + 2L * keyBytes <= maxBytes

  /** Measure `df`'s (rows, key bytes) in ONE job and return it
    * broadcast-hinted when it fits, unchanged otherwise. `df` should be
    * persisted (or cheap) — the measuring aggregate executes it once. */
  def stringKeyed(df: DataFrame, keyCol: String, maxRows: Long = MaxRows,
      maxBytes: Long = MaxBytes): DataFrame = {
    val m = df.agg(count(lit(1)), coalesce(sum(length(col(keyCol))), lit(0L))).head()
    if (fits(m.getLong(0), m.getLong(1), maxRows, maxBytes)) broadcast(df) else df
  }
}
