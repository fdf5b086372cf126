package graft

import org.apache.spark.sql.functions._
import graft.ops.Validator
import graft.operators.QualityFilter

/** Column statistics and equal-frequency binning: hand-checked stats rows,
  * NULL handling, bin-boundary semantics, and tie behavior. */
class ColumnStatsSpec extends SparkSpec {
  import spark.implicits._

  test("columnStats: min/max/nulls/ndv per column in one pass") {
    val df = Seq(
      (Some(3L), Some("b")), (Some(1L), Some("a")),
      (Some(3L), None), (None, Some("c"))
    ).toDF("k", "s")
    val got = Validator.columnStats(df, Seq("k", "s")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got("k") == ((4L, "1", "3", 1L, 2L)))
    assert(got("s") == ((4L, "a", "c", 1L, 3L)))
  }

  test("columnStats: empty input reports zero rows and NULL min/max") {
    val df = Seq((1L, "x")).toDF("k", "s").filter(lit(false))
    val row = Validator.columnStats(df, Seq("k")).head()
    assert(row.getLong(1) == 0L && row.getString(2) == null &&
      row.getLong(4) == 0L && row.getLong(5) == 0L)
  }

  test("equalFrequencyBins: uniform data splits evenly, boundaries inclusive-left") {
    // values 1..100, k=4 → exact quartile cutoffs 25.75/50.5/75.25; bin =
    // 1 + |cuts < v|, so 1..25 → bin 1, 26..50 → 2, 51..75 → 3, 76..100 → 4
    val df = (1L to 100L).toDF("v")
    val bins = QualityFilter.equalFrequencyBins(df, "v", 4)
      .groupBy("bin").agg(count(lit(1)).as("n"), min("v").as("lo"), max("v").as("hi"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(bins == Map(1L -> ((25L, 1L, 25L)), 2L -> ((25L, 26L, 50L)),
      3L -> ((25L, 51L, 75L)), 4L -> ((25L, 76L, 100L))))
  }

  test("equalFrequencyBins: ties share a bin; NULL metric bins NULL") {
    val df = (Seq.fill(90)(Some(5L)) ++ Seq(Some(99L)) ++ Seq(None)).toDF("v")
    val got = QualityFilter.equalFrequencyBins(df, "v", 3)
      .groupBy("bin").agg(count(lit(1)).as("n")).collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getLong(1)).toMap
    // all 5s land in ONE bin (no arbitrary tie-splitting); 99 above them
    assert(got(1L) == 90L)
    assert(got.getOrElse(-1L, 0L) == 1L, "NULL metric must bin NULL")
    assert(got.values.sum == 92L)
  }
}
