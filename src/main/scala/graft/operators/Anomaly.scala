package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Metric anomaly detection over keyed integer series (event counts per
  * window, rows per batch, bytes per source) — the pipeline-health monitor
  * of a recurring ingest.
  *
  * The k-sigma rule is evaluated in EXACT integer arithmetic: for a series
  * value c in a group with n points and sum s, the test
  * (c − μ)² > k²·σ² (sample variance σ² = Σ(cᵢ − μ)²/(n−1)) multiplies
  * through by n²·(n−1) into
  *
  *   (n·c − s)² · (n−1)  >  k² · Σ(n·cᵢ − s)²
  *
  * — every operand an integer (promoted to decimal(38,0) for the squares),
  * so no float mean/stddev ever enters and flags are bit-reproducible at
  * any parallelism and across engines (the q_x_anomaly oracle replays the
  * inequality verbatim). Shape: ONE shuffle on the group key; both window
  * passes share the partitioning.
  */
object Anomaly {

  def sigmaOutliers(series: DataFrame, keyCols: Seq[String], valueCol: String,
      k: Int = 3): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
    val dec: Column => Column = _.cast("decimal(38,0)")
    series
      .withColumn("_n", count(lit(1)).over(w))
      // promote BEFORE the n·c multiply: in Long it would wrap silently on
      // extreme series (while the oracle's BIGINT raises), breaking the
      // bit-reproducibility contract
      .withColumn("_dev", dec(col("_n")) * col(valueCol) - sum(col(valueCol)).over(w))
      .withColumn("_ssd", sum(dec(col("_dev")) * col("_dev")).over(w))
      .withColumn("is_anomaly",
        dec(col("_dev")) * col("_dev") * (col("_n") - 1) > lit(k * k) * col("_ssd"))
      .drop("_n", "_dev", "_ssd")
  }
}
