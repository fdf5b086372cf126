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

  test("header probe REALLY decodes BMP/WAV/PPM headers; codec formats stay unknown") {
    import spark.implicits._
    // hand-assembled canonical headers — pure bytes, no media libraries
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val bmp = "BM".getBytes ++ le32(70) ++ le32(0) ++ le32(54) ++ // file header
      le32(40) ++ le32(640) ++ le32(480) ++ le16(1) ++ le16(24) ++ new Array[Byte](20)
    val byteRate = 8000 * 2 // 8 kHz mono 16-bit
    val wav = "RIFF".getBytes ++ le32(36 + byteRate) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++ le32(byteRate) ++
      le16(2) ++ le16(16) ++ "data".getBytes ++ le32(byteRate) ++ new Array[Byte](byteRate)
    val ppm = "P6\n12 34\n255\n".getBytes ++ new Array[Byte](12 * 34 * 3)
    // truncated JPEG: recognized by signature, no SOF frame → null dims
    val jpegish = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++ new Array[Byte](32)
    // an MP3 sync frame: MPEG-1 Layer III, 128 kbps, 44.1 kHz — the HEADER
    // is plain bit-fields (parsed for real); only sample decode is stubbed.
    // 35 bytes at 128 kbps → 35*8/128 = 2 ms CBR estimate
    val mp3ish = Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte) ++ new Array[Byte](32)
    // garbage that only LOOKS like an ID3 tag → no valid sync frame → unknown
    val id3ish = "ID3".getBytes ++ new Array[Byte](16)
    val df = Seq((1L, bmp), (2L, wav), (3L, ppm), (4L, jpegish), (5L, mp3ish),
      (6L, id3ish)).toDF("media_id", "payload")
    val got = rows(Multimodal.probeMetadata(df).orderBy("media_id")
      .select("media_id", "format", "width", "height", "sample_rate", "duration_ms"))
    assert(got == Seq(
      Seq(1L, "bmp", 640, 480, null, null),
      Seq(2L, "wav", null, null, 8000, 1000),  // 16000 data bytes at 16 kB/s = 1 s
      Seq(3L, "ppm", 12, 34, null, null),
      Seq(4L, "jpeg", null, null, null, null),
      Seq(5L, "mp3", null, null, 44100, 2),
      Seq(6L, "unknown", null, null, null, null)))
  }

  test("mp3 probe: false syncs rejected, consecutive-frame evidence accepted") {
    import Multimodal.HeaderProbe
    // 128 kbps / 44.1 kHz MPEG-1 Layer III header → frame length 417 bytes
    val hdr = Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte, 0x00)
    // Sync-looking start with room for a full frame but NO second header
    // one frame later → not mp3 (pre-fix this was accepted outright).
    val falseSync = hdr ++ new Array[Byte](600)
    assert(HeaderProbe.probe(falseSync).format == "unknown")
    // Same start WITH a valid header exactly one frame (417 B) later → mp3.
    val twoFrames = hdr ++ new Array[Byte](413) ++ hdr ++ new Array[Byte](16)
    assert(HeaderProbe.probe(twoFrames).format == "mp3")
    // ID3-tagged text: tag skip lands in text, no verified frame → unknown,
    // and the scan is bounded (large payload returns fast).
    val id3Text = "ID3".getBytes ++ new Array[Byte](7) ++
      ("lorem ipsum " * 8192).getBytes
    assert(HeaderProbe.probe(id3Text).format == "unknown")
  }

  test("PNG codec: known image round-trips pixels exactly through the JDK") {
    import Multimodal.PngCodec
    // 5 rows of 3 pixels with every interesting value class.
    val bytes = Array[Byte](0, 1, 127, -128, -1, 64, 65, 66, 67, 7, 8, 9, 10, 11, 12)
    val png = PngCodec.encodeGray(bytes, width = 3)
    assert(PngCodec.isPng(png))
    // Header probe reads IHDR without decoding.
    val meta = Multimodal.HeaderProbe.probe(png)
    assert(meta.format == "png" && meta.width.contains(3) && meta.height.contains(5))
    // Full decode returns the exact unsigned byte values (gray8 lossless).
    val img = PngCodec.decode(png).get
    assert(img.getWidth == 3 && img.getHeight == 5)
    assert(PngCodec.grayPixels(img).toSeq == bytes.map(_ & 0xff).toSeq)
    // Features come from PIXELS: an all-white image scores 1.0 per stripe.
    val white = PngCodec.decode(PngCodec.encodeGray(
      Array.fill[Byte](64)(-1), width = 8)).get
    assert(PngCodec.features(white, 4).toSeq == Seq(1.0f, 1.0f, 1.0f, 1.0f))
    // extractFeatures routes PNG payloads through the real decoder.
    import spark.implicits._
    val pngMedia = Seq((1L, "image", png)).toDF("media_id", "kind", "payload")
    val feats = rows(Multimodal.extractFeatures(pngMedia))
      .head(3).asInstanceOf[collection.Seq[Float]]
    val direct = PngCodec.features(img, Multimodal.featureDim).toSeq
    assert(feats == direct)
  }

  test("imageResizeProbe: nearest-neighbor index map, hand-checked on a known raster") {
    import spark.implicits._
    // 128 'A's: source raster 64×2, every in-payload pixel = 65. 16×16 dst:
    // srcY = y*2/16 ∈ {0,1} (rows 0-7 → 0, 8-15 → 1), srcX = x*4 — all
    // sampled indices < 128, so every dst pixel is 65.
    val docs = Seq((1L, "A" * 128), (2L, "B" * 10)).toDF("doc_id", "text")
    val got = rows(Multimodal.imageResizeProbe(docs).orderBy("doc_id"))
    assert(got(0) == Seq(1L, 16L, 16L, 256L * 65L, 256L))
    // 10 'B's: srcH = 1, srcX = x*4 → indices 0,4,8 < 10 hit 'B' (66) in
    // each of the 16 identical rows; the rest are zero padding
    assert(got(1) == Seq(2L, 16L, 16L, 16L * 3L * 66L, 16L * 3L))
  }

  test("JPEG: real JDK decode — SOF header probe, tolerance round-trip, routed features") {
    import Multimodal.PngCodec
    val bytes = Array.tabulate[Byte](96)(i => (i * 2).toByte)
    val jpg = PngCodec.encodeGrayJpeg(bytes, width = 8)
    assert(PngCodec.isJpeg(jpg) && !PngCodec.isPng(jpg))
    // header probe finds the SOF frame dimensions by byte arithmetic
    val meta = Multimodal.HeaderProbe.probe(jpg)
    assert(meta.format == "jpeg" && meta.width.contains(8) && meta.height.contains(12))
    // lossy but REAL: decoded pixels approximate the originals
    val img = PngCodec.decode(jpg).get
    assert(img.getWidth == 8 && img.getHeight == 12)
    val px = PngCodec.grayPixels(img)
    val maxErr = px.toSeq.zip(bytes.map(_ & 0xff)).map { case (a, b) => math.abs(a - b) }.max
    assert(maxErr <= 24, s"JPEG round-trip drifted by $maxErr")
    // extractFeatures routes JPEG through the real decoder, not the stub
    import spark.implicits._
    val media = Seq((1L, "image", jpg)).toDF("media_id", "kind", "payload")
    val feats = rows(Multimodal.extractFeatures(media))
      .head(3).asInstanceOf[collection.Seq[Float]]
    assert(feats == PngCodec.features(img, Multimodal.featureDim).toSeq)
    assert(feats != Multimodal.StubDecoder.features(jpg).toSeq)
  }

  test("JPEG header scan: 0xFF fill bytes and stand-alone markers don't desync") {
    // hand-assembled marker stream: SOI, fill-padded APP0, TEM + RST0
    // (stand-alone, no length word), then SOF0 8x12 — a scan that reads a
    // "length" from TEM/RST or classifies a fill byte as the marker would
    // land mid-payload and miss the SOF
    def B(xs: Int*) = xs.map(_.toByte).toArray
    val jpeg =
      B(0xff, 0xd8) ++                        // SOI
      B(0xff, 0xff, 0xff, 0xe0, 0x00, 0x04, 0x4a, 0x46) ++ // fill,fill,APP0 len=4
      B(0xff, 0x01) ++                        // TEM (stand-alone)
      B(0xff, 0xd0) ++                        // RST0 (stand-alone)
      B(0xff, 0xc0, 0x00, 0x11, 0x08, 0x00, 0x0c, 0x00, 0x08) ++ // SOF0 h=12 w=8
      new Array[Byte](16)
    val meta = Multimodal.HeaderProbe.probe(jpeg)
    assert(meta.format == "jpeg" && meta.width.contains(8) && meta.height.contains(12))
    // a stream whose first frame-class byte sits inside entropy data after
    // SOS must NOT be parsed as dimensions — the scan stops at SOS
    val truncated = B(0xff, 0xd8, 0xff, 0xda, 0x00, 0x04, 0x01, 0x00,
      0xff, 0xc0, 0x00, 0x11, 0x08, 0x00, 0x0c, 0x00, 0x08)
    val m2 = Multimodal.HeaderProbe.probe(truncated)
    assert(m2.format == "jpeg" && m2.width.isEmpty && m2.height.isEmpty)
  }

  test("pngRoundTrip: decoded dims and nonzero pixels match the byte math") {
    val docs = Multimodal.syntheticMedia(spark, s"$sf0001/documents.parquet")
      .select(col("media_id").as("doc_id"),
        col("payload").cast("string").as("text")).limit(20)
    val got = Multimodal.pngRoundTrip(docs)
      .join(docs.select(col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("n")), Seq("doc_id"))
    assert(got.filter(col("png_w") =!= 64L).count() == 0)
    assert(got.filter(col("png_h") =!=
      greatest(lit(1L), ((col("n") + 63L) / 64L).cast("long"))).count() == 0)
    assert(got.filter(col("n_payload_bytes") =!= col("n")).count() == 0)
  }

  test("GIF: real multi-frame decode — header dims, frame pixels, true sampled frames") {
    import Multimodal.{GifCodec, PngCodec}
    def gray(v: Int) = {
      val img = new java.awt.image.BufferedImage(
        4, 2, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (x <- 0 until 4; y <- 0 until 2) img.getRaster.setSample(x, y, 0, v)
      img
    }
    val gif = GifCodec.encodeFrames(Seq(gray(10), gray(80), gray(160), gray(240)))
    assert(GifCodec.isGif(gif))
    val meta = Multimodal.HeaderProbe.probe(gif)
    assert(meta.format == "gif" && meta.width.contains(4) && meta.height.contains(2))
    // every animated frame decodes with its own pixel values
    val frames = GifCodec.decodeFrames(gif)
    assert(frames.size == 4)
    assert(frames.map(_.getRGB(0, 0) & 0xff) == Seq(10, 80, 160, 240))
    // sampleFrames ships REAL evenly-spaced pixel frames (as lossless PNG)
    // for GIF payloads — not stub byte splits
    import spark.implicits._
    val media = Seq((1L, "video", gif)).toDF("media_id", "kind", "payload")
    val out = Multimodal.sampleFrames(media, 2).collect().sortBy(_.getInt(1))
    assert(out.length == 2)
    // raster samples, not getRGB: the frames ship as 8-bit grayscale PNG,
    // and getRGB on TYPE_BYTE_GRAY applies a linear→sRGB conversion
    val sampled = out.map(r => PngCodec.decode(r.getAs[Array[Byte]]("frame")).get)
    assert(sampled.map(f => PngCodec.grayPixels(f).head).toSeq == Seq(10, 160)) // indices 0, 2
    // extractFeatures routes GIF through the real first-frame decode
    val feats = rows(Multimodal.extractFeatures(media)).head(3)
      .asInstanceOf[collection.Seq[Float]]
    assert(feats == PngCodec.features(frames.head, Multimodal.featureDim).toSeq)
    // garbage behind a GIF signature must degrade gracefully, never throw
    GifCodec.decodeFrames("GIF89a".getBytes ++ new Array[Byte](20)): Unit
  }

  test("WAV codec: PCM16 round-trips samples exactly; chunk walk survives LIST chunks") {
    import Multimodal.WavCodec
    val samples = Array[Short](0, 1000, -1000, 32767, -32768, 0, -1, 1)
    val wav = WavCodec.encodePcm16(samples, 8000)
    assert(WavCodec.isWav(wav))
    val (rate, ch, got) = WavCodec.decodePcm16(wav).get
    assert(rate == 8000 && ch == 1 && got.toSeq == samples.toSeq)
    // an extra LIST chunk between fmt and data must not break the walk
    val fmtAndHeader = wav.slice(0, 36)           // RIFF..fmt chunk
    val dataChunk = wav.slice(36, wav.length)
    val listChunk = "LIST".getBytes ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes
    val withList = fmtAndHeader ++ listChunk ++ dataChunk
    val (r2, _, got2) = WavCodec.decodePcm16(withList).get
    assert(r2 == 8000 && got2.toSeq == samples.toSeq)
    // torn payload → None, not garbage
    assert(WavCodec.decodePcm16(wav.dropRight(3)).isEmpty)
  }

  test("audioFeatures: exact integer features from a real decode; non-WAV rows go NULL") {
    import spark.implicits._
    import Multimodal.WavCodec
    // alternating ±1000: 7 sign changes, sum_sq = 8e6, peak = 1000
    val s = Array.tabulate[Short](8)(i => (if (i % 2 == 0) 1000 else -1000).toShort)
    val wav = WavCodec.encodePcm16(s, 4000)
    // a STEREO file with the same interleaved stream: half the frames, so
    // half the duration — energy stats unchanged (channel-agnostic)
    val stereo = WavCodec.encodePcm16(s, 4000, channels = 2)
    val media = Seq((1L, "audio", wav), (2L, "audio", Array[Byte](1, 2, 3)),
      (3L, "audio", stereo)).toDF("media_id", "kind", "payload")
    val got = rows(Multimodal.audioFeatures(media).orderBy("media_id"))
    assert(got(0) == Seq(1L, 4000, 1, 8L, 2L, 1000L, 8000000L, 1000.0, 7L))
    assert(got(1) == Seq(2L, null, null, null, null, null, null, null, null))
    assert(got(2) == Seq(3L, 4000, 2, 8L, 1L, 1000L, 8000000L, 1000.0, 7L))
  }

  test("audioDecimate: every k-th sample, recode proof, stereo/indivisible go NULL") {
    import spark.implicits._
    import Multimodal.WavCodec
    // 0, 100, -200, 300, -400, 500, -600, 700; factor 2 keeps indices 0,2,4,6
    val s = Array.tabulate[Short](8)(i =>
      (if (i == 0) 0 else (if (i % 2 == 0) -1 else 1) * i * 100).toShort)
    val wav = WavCodec.encodePcm16(s, 8000)
    val stereo = WavCodec.encodePcm16(s, 8000, channels = 2)
    val odd = WavCodec.encodePcm16(s, 9001) // 9001 % 2 != 0
    val media = Seq((1L, "audio", wav), (2L, "audio", stereo),
      (3L, "audio", odd)).toDF("media_id", "kind", "payload")
    val got = rows(Multimodal.audioDecimate(media, 2).orderBy("media_id"))
    // kept: 0, -200, -400, -600 → peak 600, sum_sq 560000; zc 1: the
    // 0→-200 step flips the (v < 0) predicate (0 counts as non-negative)
    assert(got(0) == Seq(1L, 2, 4000, 8L, 4L, 600L, 560000L, 1L, true))
    assert(got(1) == Seq(2L, 2, null, null, null, null, null, null, null))
    assert(got(2) == Seq(3L, 2, null, null, null, null, null, null, null))
  }

  test("MP3 frame layer: synth stream walks back frame-exact; VBR lengths differ") {
    import graft.multimodal.Multimodal.Mp3Codec
    // 3 frames → bitrates 128/160/192, frame lengths 417/522/626
    val payload = Array.tabulate(150)(_.toByte)
    val b = Mp3Codec.encode(payload)
    assert(b.length == 417 + 522 + 626, "VBR frame lengths must differ per frame")
    val s = Mp3Codec.frameWalk(b).get
    assert(s.nFrames == 3 && s.sampleRate == 44100 && s.vbr)
    assert(s.minKbps == 128 && s.maxKbps == 192)
    assert(s.durationMs == 3L * 1152 * 1000 / 44100) // 78 ms, frame-exact
    // single-frame stream: CBR, no VBR flag
    val one = Mp3Codec.frameWalk(Mp3Codec.encode(Array[Byte](1, 2, 3))).get
    assert(one.nFrames == 1 && !one.vbr && one.minKbps == 128)
    // junk is rejected, and the existing first-frame probe still accepts
    assert(Mp3Codec.frameWalk("not an mp3 stream at all".getBytes).isEmpty)
    val probed = graft.multimodal.Multimodal.HeaderProbe.probe(b)
    assert(probed.format == "mp3" && probed.sampleRate.contains(44100))
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

  test("imageDHash: 32-bit words, equal images hash equal, gradient flip flips bits") {
    import spark.implicits._
    // doc 0 and 1 identical; doc 2 is doc 0 character-reversed (gradients
    // flip); doc 3 is flat (all-equal pixels → no strict > → hash 0)
    val base = "abcdefghij" * 20
    // doc 3 is exactly 4 full 64-byte rows — a 200-byte payload would leave
    // a padded last row whose m→0 edge sets gradient bits
    val docs = Seq((0L, base), (1L, base), (2L, base.reverse), (3L, "m" * 256))
      .toDF("doc_id", "text")
    val h = Multimodal.imageDHash(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    h.values.foreach { case (hi, lo) =>
      assert(hi >= 0L && hi < (1L << 32) && lo >= 0L && lo < (1L << 32))
    }
    assert(h(0L) == h(1L), "identical payloads must hash identically")
    assert(h(0L) != h(2L), "reversed gradients must change the hash")
    assert(h(3L) == ((0L, 0L)), "flat image has no rising gradients")
    assert(h(0L) != ((0L, 0L)), "a gradient image must set bits")
  }
}
