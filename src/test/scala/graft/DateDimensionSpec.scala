package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.ops.DateDimension

/** C4 semantics (datespopulation.py:16-43) + the F5/F6 dialect traps. */
class DateDimensionSpec extends SparkSpec {

  private lazy val dim = DateDimension.build(spark).cache()

  test("731 consecutive dates, dense datekeys") {
    assert(dim.count() == 731)
    val keys = rows(dim.select(min("datekey"), max("datekey"))).head
    assert(keys == Seq(1L, 731L))
    assert(rows(dim.select(min("date"), max("date"))).head ==
      Seq(Date.valueOf("2023-01-01"), Date.valueOf("2024-12-31")))
  }

  test("2023-01-01 edge: Sunday (DOW 0, Redshift numbering) in ISO week 52") {
    val first = rows(dim.filter(col("date") === lit(Date.valueOf("2023-01-01")))
      .select("year", "quarter", "month", "day", "weekday", "week")).head
    assert(first == Seq(2023, 1, 1, 1, 0, 52))
  }

  test("2024-02-29 leap day present with correct parts") {
    val leap = rows(dim.filter(col("date") === lit(Date.valueOf("2024-02-29")))
      .select("year", "quarter", "month", "day", "weekday")).head
    assert(leap == Seq(2024, 1, 2, 29, 4)) // Thursday = 4 in 0=Sunday numbering
  }

  test("custom range") {
    val d = DateDimension.build(spark, Date.valueOf("1995-01-01"), Date.valueOf("2001-12-31"))
    assert(d.count() == 2557)
  }
}
