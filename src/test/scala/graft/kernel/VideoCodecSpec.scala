package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

class VideoCodecSpec extends AnyFunSuite {

  // the l83 fixture formula (Multimodal.syntheticVideos): every frame
  // pixel a function of (id, frame, x, y)
  private def fixturePixel(id: Long)(f: Int, x: Int, y: Int): Int = {
    val r = ((id * 7 + f * 41 + x * 13 + y * 31) % 256).toInt
    val g = ((id * 11 + f * 43 + x * 17 + y * 5) % 256).toInt
    val b = ((id * 3 + f * 47 + x * 29 + y * 23) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  /** Independent dHash re-derivation from the pixel formula alone —
    * the same integer arithmetic the l83 DuckDB oracle runs, never
    * touching encoded bytes. Decode path must match it exactly.
    */
  private def formulaDHash(id: Long, f: Int, w: Int, h: Int): Long = {
    def luma(x2: Int, y2: Int): Int = {
      val rgb = fixturePixel(id)(f, (x2 * w) / 9, (y2 * h) / 7)
      (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff)
        + 114 * (rgb & 0xff)) / 1000
    }
    (for (x <- 0 until 8; y <- 0 until 7 if luma(x + 1, y) > luma(x, y))
      yield 1L << (x * 7 + y)).sum
  }

  test("MPNG AVI round-trip: probe metadata and exact frame bytes") {
    val pngs = (0 until 3).map(f =>
      ImageCodec.encodePng(5, 4, (x, y) => fixturePixel(9L)(f, x, y)))
    val avi = VideoCodec.encodeAvi(5, 4, 40000L, pngs, "MPNG")
    assert(VideoCodec.looksLikeAvi(avi))
    val meta = VideoCodec.probe(avi).get
    assert(meta.width == 5 && meta.height == 4 && meta.nFrames == 3)
    assert(meta.usPerFrame == 40000L && meta.durationMs == 120L)
    val fs = VideoCodec.frames(avi)
    assert(fs.length == 3)
    // the RIFF walk returns the exact frame bitstreams written
    // (decoder-independent byte equality, including odd-size padding)
    fs.zip(pngs).foreach { case (a, b) => assert(a.sameElements(b)) }
  }

  test("MJPEG AVI: JPEG frames survive the box walk and decode") {
    def jpeg(seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        16, 12, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 12; x <- 0 until 16)
        img.setRGB(x, y, fixturePixel(seed.toLong)(0, x, y))
      val out = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
      try javax.imageio.ImageIO.write(img, "jpg", ios) finally ios.close()
      out.toByteArray
    }
    val js = Seq(jpeg(1), jpeg(2), jpeg(3))
    // JPEG streams are routinely odd-length → exercises the pad byte
    val avi = VideoCodec.encodeAvi(16, 12, 33367L, js, "MJPG")
    val fs = VideoCodec.frames(avi)
    assert(fs.length == 3)
    fs.zip(js).foreach { case (a, b) => assert(a.sameElements(b)) }
    // each extracted frame is a decodable JPEG with the right dims
    fs.foreach { fb =>
      val d = ImageCodec.decode(fb).get
      assert(d.width == 16 && d.height == 12)
    }
  }

  test("fixture video decodes to the formula-derived keyframe dHashes") {
    // the l83 contract, end to end in one JVM: AVI encode → RIFF walk
    // → PNG decode → dHash56 must equal the dHash derived from the
    // generative formula without ever touching encoded bytes
    for (id <- Seq(0L, 7L, 23L, 59L)) {
      val w = (3 + id % 6).toInt
      val h = (3 + id % 4).toInt
      val nf = (2 + id % 3).toInt
      val avi = VideoCodec.encodeMpngAvi(w, h, nf, 40000L,
        (f, x, y) => fixturePixel(id)(f, x, y))
      val got = VideoCodec.frames(avi).map(fb => ImageCodec.dHash56(fb).get)
      val want = (0 until nf).map(f => formulaDHash(id, f, w, h))
      assert(got == want, s"id=$id")
    }
  }

  test("pinned keyframe dHashes for the committed id=5 fixture") {
    // literal pin (r11 verdict #6 'pinned keyframe dHashes'): id=5 →
    // 8×4, 3 frames. Values cross-checked against formulaDHash; a
    // decoder/codec change that shifts any pixel breaks this loudly.
    val avi = VideoCodec.encodeMpngAvi(8, 4, 3, 40000L,
      (f, x, y) => fixturePixel(5L)(f, x, y))
    val got = VideoCodec.frames(avi).map(fb => ImageCodec.dHash56(fb).get)
    val want = (0 until 3).map(f => formulaDHash(5L, f, 8, 4))
    assert(got == want)
    assert(got.forall(h => h >= 0L && h < (1L << 56)))
  }

  test("corrupt input: typed empties, never exceptions or OOM") {
    assert(!VideoCodec.looksLikeAvi(null))
    assert(!VideoCodec.looksLikeAvi(Array[Byte](1, 2, 3)))
    assert(VideoCodec.probe("RIFFxxxxAVI ".getBytes).isEmpty)
    assert(VideoCodec.frames("not a video at all".getBytes).isEmpty)
    // truncated mid-chunk: header promises more bytes than exist
    val good = VideoCodec.encodeMpngAvi(4, 4, 2, 40000L, (f, x, y) => f + x + y)
    val truncated = java.util.Arrays.copyOf(good, good.length / 2)
    VideoCodec.frames(truncated) // must not throw
    // chunk size field overflowing the buffer: clamped, not allocated
    val evil = good.clone()
    evil(good.length - 6) = 0xff.toByte // corrupt last chunk's size
    evil(good.length - 5) = 0xff.toByte
    VideoCodec.frames(evil) // must not throw / not allocate 4 GB
  }
}
