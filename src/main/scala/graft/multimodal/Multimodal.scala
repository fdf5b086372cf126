package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, processed batch-wise with `mapPartitions`
  * (the Scala equivalent of a pandas `mapInPandas` UDF: one JVM-side batch
  * iterator per partition, no per-row launch overhead).
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): [[StubDecoder]] produces deterministic pseudo-features from
  * the bytes. Everything around it — schema, batching, partition sizing,
  * feature layout — is real and tested, so a real decoder drops in by
  * replacing one function.
  *
  * Scale notes: media rows are large (MBs), so [[repartitionForPayloads]]
  * targets a row-count per partition rather than Spark's default byte-based
  * splits, keeping peak executor memory = batch × payload bounded. Feature
  * extraction is embarrassingly parallel; the frame-sample op emits multiple
  * rows per input (flatMap shape), which Spark handles without skew as long
  * as payload sizes are bounded.
  */
object Multimodal {

  /** media(media_id, kind, payload, width, height, duration_ms) */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),       // image | audio | video
    StructField("payload", BinaryType, nullable = false),    // opaque encoded bytes
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("duration_ms", IntegerType)))

  val featureDim = 8

  /** The stub codec: a real build replaces these with JNI/ffmpeg/etc. Each is
    * a pure function bytes → value, deterministic for testability. */
  object StubDecoder {
    /** Pseudo "embedding": moments of the byte stream per stripe. */
    def features(payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](featureDim)
      if (payload.isEmpty) return out
      var i = 0
      while (i < payload.length) {
        out(i % featureDim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      val stripe = math.max(1, payload.length / featureDim)
      var j = 0
      while (j < featureDim) { out(j) /= stripe.toFloat; j += 1 }
      out
    }

    /** Pseudo "resize": deterministic subsample of the payload bytes. */
    def resize(payload: Array[Byte], targetBytes: Int): Array[Byte] = {
      if (payload.length <= targetBytes) payload
      else Array.tabulate(targetBytes)(i => payload((i.toLong * payload.length / targetBytes).toInt))
    }

    /** Pseudo "frame sample": split the payload into n equal frames. */
    def sampleFrames(payload: Array[Byte], n: Int): Seq[Array[Byte]] = {
      val size = math.max(1, payload.length / math.max(1, n))
      payload.grouped(size).take(n).toSeq
    }
  }

  /** Bound rows-per-partition so batch × payload stays in executor memory
    * (media rows are MB-scale; byte-based splits under-estimate them). */
  def repartitionForPayloads(df: DataFrame, rowsPerPartition: Int): DataFrame = {
    val n = math.max(1, (df.count() / math.max(1, rowsPerPartition)).toInt)
    df.repartition(n)
  }

  /** Decode + feature-extract, one batch iterator per partition. Output:
    * (media_id, kind, n_bytes, features: array<float>). */
  def extractFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    media.select("media_id", "kind", "payload").mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]]("payload")
        Row(r.getLong(0), r.getString(1), bytes.length.toLong,
          StubDecoder.features(bytes).toSeq)
      }
    }(enc)
  }

  /** Payload "resize" (image downscale stand-in): binary → bounded binary,
    * batch-wise per partition; metadata passes through. */
  def resizePayloads(media: DataFrame, targetBytes: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("n_bytes_in", LongType, nullable = false),
      StructField("n_bytes_out", LongType, nullable = false)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    media.select("media_id", "kind", "payload").mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]]("payload")
        val out = StubDecoder.resize(bytes, targetBytes)
        Row(r.getLong(0), r.getString(1), out, bytes.length.toLong, out.length.toLong)
      }
    }(enc)
  }

  /** Frame sampling (video → n frame rows each): flatMap shape. */
  def sampleFrames(media: DataFrame, nFrames: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    media.select("media_id", "payload").mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("payload")
        StubDecoder.sampleFrames(bytes, nFrames).zipWithIndex.map {
          case (f, i) => Row(r.getLong(0), i, f)
        }
      }
    }(enc)
  }

  /** Deterministic synthetic media table (documents' text bytes as payload)
    * for tests and demos — real pipelines read actual media files here. */
  def syntheticMedia(spark: SparkSession, documentsDir: String): DataFrame =
    spark.read.parquet(documentsDir)
      .select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
        col("text").cast("binary").as("payload"),
        (col("doc_id") % 1920).cast("int").as("width"),
        (col("doc_id") % 1080).cast("int").as("height"),
        (col("n_chars") * 10).cast("int").as("duration_ms"))
}
