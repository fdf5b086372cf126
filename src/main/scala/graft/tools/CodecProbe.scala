package graft.tools

/** Dev microbench: isolate per-row codec cost from Spark plumbing (run via
  * dev/run_main.sh graft.tools.CodecProbe). Not part of the gate surface. */
object CodecProbe {
  def main(args: Array[String]): Unit = {
    val payload = ("The quick brown fox jumps over the lazy dog. " * 7).getBytes("UTF-8")
    val M = graft.multimodal.Multimodal
    def time(label: String, n: Int)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) { f; i += 1 }
      println(f"$label: ${(System.nanoTime() - t0) / 1e3 / n}%.1f us/op over $n")
    }
    val reader = M.PngCodec.newPngReader()
    time("encodeGray", 5000) { M.PngCodec.encodeGray(payload, 64) }
    val png = M.PngCodec.encodeGray(payload, 64)
    time("decodeWith", 5000) { M.PngCodec.decodeWith(reader, png) }
    time("decode(ImageIO.read)", 5000) { M.PngCodec.decode(png) }
    val img = M.PngCodec.decode(png).get
    time("grayPixels", 5000) { M.PngCodec.grayPixels(img) }
    time("encodePng", 5000) { M.PngCodec.encodePng(img) }
    val writer = M.GifCodec.newWriter()
    val greader = M.GifCodec.newReader()
    val h = (payload.length + 1) / 2
    def grayFrame(slice: Array[Byte]) = {
      val rows0 = math.max(1, (slice.length + 63) / 64)
      val im = new java.awt.image.BufferedImage(64, rows0,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      var i = 0
      while (i < slice.length) {
        im.getRaster.setSample(i % 64, i / 64, 0, slice(i) & 0xff); i += 1
      }
      im
    }
    val frames = Seq(grayFrame(payload.take(h)), grayFrame(payload.drop(h)))
    time("gif encodeFramesWith", 2000) { M.GifCodec.encodeFramesWith(writer, frames) }
    val gif = M.GifCodec.encodeFramesWith(writer, frames)
    time("gif decodeFramesWith", 2000) { M.GifCodec.decodeFramesWith(greader, gif) }
  }
}
