package graft.ops

import java.sql.Date
import java.time.temporal.ChronoUnit
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** C4: date-dimension generation (datespopulation.py:16-43).
  *
  * The reference generates 731 consecutive dates (2023-01-01..2024-12-31) by
  * abusing `ROW_NUMBER() OVER (ORDER BY 1)` against a system table with
  * `LIMIT 731` (datespopulation.py:19-23), then projects date parts F1-F6.
  * Spark has a proper generator leaf: `spark.range(n)` — parallel, no
  * single-partition sort, no row-source hack (SURVEY.md §4, W1).
  *
  * Dialect traps pinned here (SURVEY.md §7.5.4):
  *  - `weekday`: Redshift `EXTRACT(DOW ...)` is 0=Sunday..6=Saturday; Spark's
  *    `dayofweek` is 1=Sunday..7=Saturday → subtract 1 (F5).
  *  - `week`: Redshift and Spark `weekofyear` are both ISO weeks — so
  *    2023-01-01 lands in ISO week 52 (of 2022). Kept as-is (F6).
  */
object DateDimension {

  val DefaultStart: Date = Date.valueOf("2023-01-01")
  val DefaultEnd: Date = Date.valueOf("2024-12-31")

  /** dim_dates(datekey, date, year, quarter, month, day, weekday, week) —
    * datespopulation.py:27 insert list; `datekey` is the IDENTITY ordinal. */
  def build(spark: SparkSession, start: Date = DefaultStart, end: Date = DefaultEnd): DataFrame = {
    val days = ChronoUnit.DAYS.between(start.toLocalDate, end.toLocalDate) + 1
    require(days > 0, s"empty date range $start..$end")
    spark.range(days)
      .select(
        (col("id") + 1).as("datekey"),
        date_add(lit(start), col("id").cast(IntegerType)).as("date"))
      .select(
        col("datekey"), col("date"),
        year(col("date")).as("year"),
        quarter(col("date")).as("quarter"),
        month(col("date")).as("month"),
        dayofmonth(col("date")).as("day"),
        (dayofweek(col("date")) - 1).as("weekday"),   // Redshift DOW numbering
        weekofyear(col("date")).as("week"))
  }
}
