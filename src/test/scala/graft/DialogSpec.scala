package graft

import org.apache.spark.sql.functions._
import graft.operators.Dialog

/** Transcript assembly: order pinning, turn cap, arrival-order invariance. */
class DialogSpec extends SparkSpec {
  import spark.implicits._

  private def ev = Seq(
    (1L, 30L, 103L, "c"), (1L, 10L, 101L, "a"), (1L, 20L, 102L, "b"),
    (2L, 10L, 201L, "x")
  ).toDF("user_id", "ts_us", "event_id", "event_type")

  test("turnAudit: alternation breaks, role balance, shape checks") {
    import org.apache.spark.sql.functions._
    // u1: user,assistant,assistant,user -> 1 break, starts user, ends user
    // u2: single assistant turn -> 0 breaks (guard), wrong opening
    val df = Seq(
      (1L, 10L, 1L, "user", 5L), (1L, 20L, 2L, "assistant", 7L),
      (1L, 30L, 3L, "assistant", 3L), (1L, 40L, 4L, "user", 2L),
      (2L, 10L, 5L, "assistant", 9L)
    ).toDF("user_id", "ts_us", "event_id", "role0", "len0")
    val got = graft.operators.Dialog.turnAudit(df, "user_id",
        Seq("ts_us", "event_id"), col("role0"), col("len0"))
      .select("user_id", "n_turns", "n_user_turns", "n_assistant_turns",
        "n_alternation_breaks", "starts_with_user", "ends_with_assistant",
        "sum_turn_len")
      .as[(Long, Long, Long, Long, Long, Boolean, Boolean, Long)]
      .collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 4L, 2L, 2L, 1L, true, false, 17L),
      (2L, 1L, 0L, 1L, 0L, false, true, 9L)))
  }

  test("turns render in (ts, event_id) order regardless of input order") {
    val r = Dialog.renderTranscripts(ev, "user_id", Seq("ts_us", "event_id"),
        col("event_type"), 20)
      .orderBy("user_id").collect()
    assert(r(0).getString(2) == "a\nb\nc" && r(0).getLong(1) == 3L)
    assert(r(1).getString(2) == "x" && r(1).getLong(1) == 1L)
  }

  test("maxTurns caps the transcript to the FIRST turns") {
    val r = Dialog.renderTranscripts(ev.filter(col("user_id") === 1),
      "user_id", Seq("ts_us", "event_id"), col("event_type"), 2).head()
    assert(r.getString(2) == "a\nb" && r.getLong(1) == 2L)
  }

  test("same-timestamp turns break ties on event_id deterministically") {
    val tie = Seq((1L, 10L, 2L, "second"), (1L, 10L, 1L, "first"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
    val r = Dialog.renderTranscripts(tie, "user_id", Seq("ts_us", "event_id"),
      col("event_type"), 20).head()
    assert(r.getString(2) == "first\nsecond")
  }

  test("preferencePairs: extremes, tie-breaks, margin gate, degenerate groups") {
    val cands = Seq(
      // g1: clear spread — best 30 (id 3), worst 10 (id 1)
      ("g1", 1L, 10L), ("g1", 2L, 20L), ("g1", 3L, 30L),
      // g2: ties at both extremes — min id wins on each side
      ("g2", 5L, 40L), ("g2", 4L, 40L), ("g2", 7L, 5L), ("g2", 6L, 5L),
      // g3: margin below the gate
      ("g3", 8L, 100L), ("g3", 9L, 104L),
      // g4: singleton — never a pair
      ("g4", 10L, 99L),
      // g5: all tied — chosen == rejected row, dropped
      ("g5", 11L, 7L), ("g5", 12L, 7L))
      .toDF("grp", "id", "score")
    val got = Dialog.preferencePairs(cands, "grp", "id", "score", minMargin = 5L)
      .select("grp", "chosen_id", "rejected_id", "margin", "n_cands")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      ("g1", 3L, 1L, 20L, 3L),
      ("g2", 4L, 6L, 35L, 4L)))
    // partition-invariant
    val again = Dialog.preferencePairs(cands.repartition(7), "grp", "id", "score", 5L)
      .select("grp", "chosen_id", "rejected_id", "margin", "n_cands")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(again.toSeq == got.toSeq)
  }
}
