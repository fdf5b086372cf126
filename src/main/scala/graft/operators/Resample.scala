package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Time-series resampling: project each key's event stream onto a fixed-step
  * grid, forward-filling the most recent observation (last observation
  * carried forward) — the gap-fill every metrics/feature pipeline runs
  * before aligning series for training or joins.
  *
  * Pure composition, no new machinery: a per-key bounds aggregate → a
  * `sequence` explode for the grid → the NATIVE as-of join
  * ([[AsOfJoin.native]], the custom physical operator) to attach the latest
  * event at or before each grid instant. Cost is one agg over the events +
  * a grid of (observed span / step) rows per key + one co-partitioned
  * merge — no per-key loops, no cross join, and the grid is
  * data-proportional (keys with short histories emit short grids).
  */
object Resample {

  /** One row per `keyCol` per `step` multiple inside the key's observed
    * [min(ts), max(ts)] range, carrying `matched_<idCol>` /
    * `matched_<valueCol>` of the most recent event at or before the grid
    * instant (never null: the grid starts at the first step multiple ≥ the
    * key's first event). `tsCol` must be an integral epoch column (e.g.
    * micros) — grid arithmetic and `step` share its units. Null keys or
    * timestamps are excluded (no series to resample). Ties inside one
    * (key, ts) resolve to the largest `idCol`, as in [[AsOfJoin]]. */
  def gapFillForward(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, step: Long): DataFrame = {
    require(step > 0, "gapFillForward: step must be positive")
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val tsType = events.schema.fields.find(_.name.equalsIgnoreCase(tsCol)).map(_.dataType)
    require(tsType.exists(Seq(LongType, IntegerType, ShortType, ByteType).contains),
      s"gapFillForward: ts '$tsCol' must be integral epoch units (got " +
        s"${tsType.map(_.simpleString).getOrElse("missing")}) — cast date/timestamp " +
        "to epoch days/micros so step has explicit units")
    val e = events.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
    val grid = e.groupBy(col(keyCol))
      .agg(min(col(tsCol)).as("__min_ts"), max(col(tsCol)).as("__max_ts"))
      // integer ceil/floor of the bounds onto step multiples (ts ≥ 0)
      .withColumn("__k0", expr(s"(__min_ts + $step - 1) div $step"))
      .withColumn("__k1", expr(s"__max_ts div $step"))
      // a span containing no step multiple emits NO grid rows — without
      // this, sequence(k0 > k1) silently generates a DESCENDING range of
      // out-of-span instants
      .filter(col("__k0") <= col("__k1"))
      .select(col(keyCol), explode(sequence(col("__k0"), col("__k1"))).as("__k"))
      .select(col(keyCol), (col("__k") * step).cast("long").as(tsCol))
    AsOfJoin.native(grid, e, keyCol, tsCol, idCol, valueCol)
  }
}
