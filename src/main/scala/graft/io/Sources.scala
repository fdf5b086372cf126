package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.TableSpec

/** Sources/sinks for the reference's load contract. */
object Sources {

  /** S1: CSV bulk load with an explicit schema — the Spark equivalent of the
    * reference's `COPY t FROM s3 FORMAT AS CSV DELIMITER ',' IGNOREHEADER 1`
    * (validate_data.py:138-146). The reference relies on the pre-created
    * Redshift table schema (schema-on-write, no inference); we pass the
    * TableSpec's StructType and fail fast on malformed rows, matching COPY's
    * abort-on-error default.
    *
    * Scale note: CSV is splittable when uncompressed — a 100 TB load fans out
    * to one task per 128 MB split with no driver involvement. Schema is
    * explicit, so no inference pass over the data.
    */
  def csv(spark: SparkSession, path: String, spec: TableSpec): DataFrame =
    spark.read
      .schema(spec.schema)
      .option("header", "true")          // IGNOREHEADER 1
      .option("delimiter", ",")
      .option("mode", "FAILFAST")
      .csv(path)

  /** S3: read a named parquet table from a test-data directory. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
