package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Binary-column plumbing with the stubbed decoder: schema, batching, and
  * determinism are the real things under test (no media libs here). */
class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.syntheticMedia(spark, s"$sf0001/documents.parquet").cache()

  test("synthetic media table has the canonical multimodal schema") {
    val s = media.schema
    assert(s("payload").dataType.typeName == "binary")
    assert(Seq("media_id", "kind", "payload", "width", "height", "duration_ms")
      .forall(s.fieldNames.contains))
    assert(media.count() == 500)
  }

  test("feature extraction: fixed dim, deterministic across runs") {
    val f1 = Multimodal.extractFeatures(media)
    assert(f1.schema("features").dataType.simpleString == "array<float>")
    val r1 = rows(f1.orderBy("media_id").limit(5))
    val r2 = rows(Multimodal.extractFeatures(media).orderBy("media_id").limit(5))
    assert(r1 == r2)
    assert(r1.forall(_(3).asInstanceOf[collection.Seq[Float]].size == Multimodal.featureDim))
    // n_bytes matches payload length
    val mismatch = Multimodal.extractFeatures(media)
      .join(media.select(col("media_id"), length(col("payload")).cast("long").as("len")), Seq("media_id"))
      .filter(col("n_bytes") =!= col("len"))
    assert(mismatch.count() == 0)
  }

  test("frame sampling is a flatMap: n frames per row, bytes partition the payload") {
    val frames = Multimodal.sampleFrames(media.limit(10), 4)
    val counts = frames.groupBy("media_id").count()
    assert(rows(counts.select("count")).flatten.forall(_ == 4L))
    // reassembled frame lengths sum to ≤ payload length (grouped split)
    val sums = frames.groupBy("media_id").agg(sum(length(col("frame"))).as("fl"))
      .join(media.select(col("media_id"), length(col("payload")).as("pl")), Seq("media_id"))
    assert(sums.filter(col("fl") > col("pl")).count() == 0)
  }

  test("resize bounds payload bytes and reports in/out sizes") {
    val resized = Multimodal.resizePayloads(media, 64)
    assert(resized.filter(col("n_bytes_out") > 64).count() == 0)
    assert(resized.filter(col("n_bytes_out") =!= length(col("payload"))).count() == 0)
    // small payloads pass through untouched
    assert(resized.filter(col("n_bytes_in") <= 64 && col("n_bytes_out") =!= col("n_bytes_in")).count() == 0)
  }

  test("payload-aware repartitioning bounds rows per partition") {
    val rep = Multimodal.repartitionForPayloads(media, 100)
    assert(rep.rdd.getNumPartitions == 5)
  }

  test("stub decoder: deterministic, resize bounds size, frames cover bytes") {
    val bytes = Array.tabulate[Byte](1000)(i => (i % 251).toByte)
    val f1 = Multimodal.StubDecoder.features(bytes)
    val f2 = Multimodal.StubDecoder.features(bytes.clone())
    assert(f1.toSeq == f2.toSeq)
    assert(Multimodal.StubDecoder.resize(bytes, 100).length == 100)
    assert(Multimodal.StubDecoder.resize(bytes, 2000).length == 1000)
    assert(Multimodal.StubDecoder.sampleFrames(bytes, 4).map(_.length).sum == 1000)
  }
}
