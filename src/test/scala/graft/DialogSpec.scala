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
}
