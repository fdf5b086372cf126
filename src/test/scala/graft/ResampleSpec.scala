package graft

import org.apache.spark.sql.functions._
import graft.operators.Resample

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  // (event_id, key, ts, value)
  private val events = Seq(
    (1L, 1L, 5L, 10.0),   // key 1: events at 5, 23, 31 → grid 10,20,30 (step 10)
    (2L, 1L, 23L, 20.0),
    (3L, 1L, 31L, 30.0),
    (4L, 2L, 10L, 1.0),   // key 2: span [10, 20] exactly on multiples
    (5L, 2L, 20L, 2.0),
    (6L, 3L, 14L, 7.0)    // key 3: span [14,16] contains NO multiple → no rows
  ) ++ Seq((7L, 3L, 16L, 8.0))

  test("forward fill on the step grid, bounds inclusive, empty spans emit nothing") {
    val got = Resample.gapFillForward(events.toDF("event_id", "key", "ts", "value"),
        "key", "ts", "event_id", "value", step = 10L)
      .select($"key", $"ts", $"matched_event_id", $"matched_value")
      .as[(Long, Long, Long, Double)].collect().toSeq.sorted
    assert(got == Seq(
      (1L, 10L, 1L, 10.0), // last event at t<=10 is id 1
      (1L, 20L, 1L, 10.0), // still id 1 (gap carried forward)
      (1L, 30L, 2L, 20.0), // id 2 (t=23) carried to 30; id 3 (t=31) not yet
      (2L, 10L, 4L, 1.0),  // grid instant == event instant: at-or-before
      (2L, 20L, 5L, 2.0)))
    // key 3 (span [14,16], no multiple of 10 inside) emitted nothing —
    // a descending sequence() would have fabricated instants 20 and 10
  }

  test("null keys/timestamps are excluded; matches are never null on the grid") {
    val withNulls = events.toDF("event_id", "key", "ts", "value")
      .unionByName(Seq((8L, Option.empty[Long], Option(40L), 9.0),
        (9L, Option(1L), Option.empty[Long], 9.0))
        .toDF("event_id", "key", "ts", "value"))
    val got = Resample.gapFillForward(withNulls, "key", "ts", "event_id", "value", 10L)
    assert(got.filter($"matched_event_id".isNull).count() == 0)
    assert(got.count() == 5)
  }

  test("non-integral ts fails loudly") {
    val e = intercept[IllegalArgumentException](Resample.gapFillForward(
      Seq((1L, 1L, "2024-01-01", 1.0)).toDF("event_id", "key", "ts", "value")
        .withColumn("ts", $"ts".cast("timestamp")),
      "key", "ts", "event_id", "value", 10L))
    assert(e.getMessage.contains("integral"))
  }
}
