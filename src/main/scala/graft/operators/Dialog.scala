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

  /** Turn-structure audit for conversation / instruction data — the SFT
    * hygiene report run before transcripts become training examples: per
    * conversation, turn counts by role, ALTERNATION BREAKS (consecutive
    * same-role turns — the classic sign of merged or dropped messages),
    * whether the exchange opens with a user turn and closes with an
    * assistant turn (the only shape most chat templates accept), and the
    * exact total turn length. Conversations failing the shape checks get
    * repaired or dropped upstream of any template render.
    *
    * Same one-aggregate shape as [[renderTranscripts]] (ordered collect
    * per key, order pinned by `orderCols`), then pure map-side HOF counts
    * over the per-conversation arrays — conversation-count-sized output,
    * one shuffle total. */
  def turnAudit(events: DataFrame, keyCol: String, orderCols: Seq[String],
      roleCol: Column, lenCol: Column): DataFrame = {
    val sortStruct = struct(
      orderCols.map(col) ++ Seq(roleCol.as("role"), lenCol.cast("long").as("len")): _*)
    events.groupBy(col(keyCol))
      .agg(collect_list(sortStruct).as("__t"))
      .withColumn("__roles", expr("transform(array_sort(__t), x -> x.role)"))
      .withColumn("__lens", expr("transform(array_sort(__t), x -> x.len)"))
      .select(col(keyCol),
        size(col("__roles")).cast("long").as("n_turns"),
        expr("size(filter(__roles, r -> r = 'user'))").cast("long").as("n_user_turns"),
        expr("size(filter(__roles, r -> r = 'assistant'))").cast("long")
          .as("n_assistant_turns"),
        // sequence(1, 0) counts DOWN — the n_turns < 2 guard must stay
        expr("IF(size(__roles) < 2, 0L, CAST(size(filter(sequence(1, size(__roles) - 1), " +
          "i -> element_at(__roles, i + 1) = element_at(__roles, i))) AS LONG))")
          .as("n_alternation_breaks"),
        (expr("element_at(__roles, 1)") === lit("user")).as("starts_with_user"),
        (expr("element_at(__roles, -1)") === lit("assistant")).as("ends_with_assistant"),
        expr("aggregate(__lens, 0L, (a, x) -> a + x)").as("sum_turn_len"))
  }

  /** Preference-pair construction for reward-model / DPO-style training:
    * within each candidate group (responses to one prompt; here, documents
    * competing in one stratum), pair the BEST-scored candidate (chosen)
    * with the WORST (rejected), keeping only pairs whose score margin
    * clears `minMargin` — low-margin pairs are label noise, the first
    * thing preference-data recipes drop.
    *
    * Determinism: chosen = (max score, then min id), rejected = (min
    * score, then min id) — both as single struct-min aggregates, so the
    * argmax never depends on row order. A group whose best and worst are
    * the same row (singleton or all-tied) emits nothing.
    *
    * Scale: ONE groupBy(grp) shuffle with map-side partial aggregation;
    * output is group-count-sized. No windows, no self-join — the
    * row_number-based form shuffles the full candidate set into window
    * partitions and re-joins it; two struct extremes per group is the
    * same answer at a fraction of the exchange. */
  def preferencePairs(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, minMargin: Long): DataFrame =
    df.select(col(groupCol).as("grp"), col(idCol).cast("long").as("id"),
        col(scoreCol).cast("long").as("score"))
      .groupBy(col("grp"))
      .agg(
        min(struct((-col("score")).as("ns"), col("id").as("i"))).as("best"),
        min(struct(col("score").as("s"), col("id").as("i"))).as("worst"),
        count(lit(1)).as("n_cands"))
      .select(col("grp"),
        col("best.i").as("chosen_id"), (-col("best.ns")).as("chosen_score"),
        col("worst.i").as("rejected_id"), col("worst.s").as("rejected_score"),
        (-col("best.ns") - col("worst.s")).as("margin"),
        col("n_cands"))
      .filter(col("chosen_id") =!= col("rejected_id") &&
        col("margin") >= minMargin)
}
