package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Conversation / interaction-transcript assembly: collapse a keyed event
  * stream into one ordered, rendered transcript document per key — the
  * export step that turns raw interaction logs into chat-format training
  * documents (each user's session history becomes one sequence, capped at a
  * turn budget). The inverse of sessionization's summary rows: this keeps
  * the CONTENT, ordered, as a single text per key.
  *
  * == Determinism ==
  * Turn order is pinned by the caller's `orderCols` (callers must make the
  * tuple unique per key — e.g. (ts_us, event_id)); the collected list is
  * array_sort'ed on exactly those fields, so the rendered text is
  * bit-identical across reruns and engines regardless of arrival order.
  *
  * == 100 TB shape ==
  * ONE groupBy(key) shuffle; each group materializes only its own turn list
  * (bounded by the per-key event count — cap upstream if keys are
  * pathological), then slices to `maxTurns` and renders map-side. No
  * windows, no joins, no driver state.
  */
object Dialog {

  /** One row per key: `n_turns` (≤ maxTurns) and `transcript` — the first
    * `maxTurns` rendered `lineCol` strings in `orderCols` order, joined
    * with `\n`. */
  def renderTranscripts(events: DataFrame, keyCol: String, orderCols: Seq[String],
      lineCol: Column, maxTurns: Int): DataFrame = {
    val sortStruct = struct(orderCols.map(col) :+ lineCol.as("line"): _*)
    events.groupBy(col(keyCol))
      .agg(collect_list(sortStruct).as("turns"))
      .select(col(keyCol),
        least(size(col("turns")), lit(maxTurns)).cast("long").as("n_turns"),
        array_join(
          transform(slice(array_sort(col("turns")), 1, maxTurns), _.getField("line")),
          "\n").as("transcript"))
  }
}
