package graft.kernel

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** ImageCodec: real javax.imageio decode, pinned by COMMITTED binary
  * fixtures (so a JDK/ImageIO behavior change surfaces as a test
  * failure, not silently shifted features) plus encode→decode
  * round-trips over generated pixels.
  */
class ImageCodecSpec extends AnyFunSuite {
  private def fixture(name: String): Array[Byte] =
    Files.readAllBytes(Paths.get(s"src/test/resources/graft/$name"))

  test("committed PNG fixture decodes to exact dimensions and channel means") {
    // fixture_4x3.png: r = x*50+10, g = y*60+20, b = x*20+y*30
    val d = ImageCodec.decode(fixture("fixture_4x3.png")).get
    assert(d.width == 4 && d.height == 3)
    assert(d.meanR == 85.0) // (10+60+110+160)/4
    assert(d.meanG == 80.0) // (20+80+140)/3
    assert(d.meanB == 60.0) // 30 + 30
  }

  test("committed JPEG fixture decodes (dimensions exact; JPEG is lossy)") {
    val d = ImageCodec.decode(fixture("fixture_8x5.jpg")).get
    assert(d.width == 8 && d.height == 5)
    // channel means survive lossy compression approximately
    assert(math.abs(d.meanR - 105.0) < 20.0)
  }

  test("encode→decode round-trip is exact for arbitrary RGB pixels (PNG lossless)") {
    val w = 7; val h = 4
    def rgb(x: Int, y: Int): Int =
      (((x * 37 + y * 91) % 256) << 16) | (((x * 53 + y * 11) % 256) << 8) | ((x * 3 + y * 71) % 256)
    val bytes = ImageCodec.encodePng(w, h, rgb)
    assert(ImageCodec.looksLikeImage(bytes))
    val d = ImageCodec.decode(bytes).get
    assert(d.width == w && d.height == h)
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val p = rgb(x, y)
      sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
    }
    val n = (w * h).toDouble
    assert(d.meanR == sr / n && d.meanG == sg / n && d.meanB == sb / n)
  }

  test("non-image payloads are rejected cheaply, not decoded") {
    assert(ImageCodec.decode(null).isEmpty)
    assert(ImageCodec.decode(Array.empty[Byte]).isEmpty)
    assert(ImageCodec.decode("just some text".getBytes("UTF-8")).isEmpty)
    assert(!ImageCodec.looksLikeImage("PNG but not really".getBytes("UTF-8")))
  }

  test("truncated PNG returns None instead of throwing") {
    val full = ImageCodec.encodePng(5, 5, (x, y) => x * y)
    val truncated = full.take(20)
    assert(ImageCodec.decode(truncated).isEmpty)
  }

  test("resizeNearestPng samples (x2*w/w2, y2*h/h2) and round-trips losslessly") {
    def px(x: Int, y: Int): Int = ((x * 50 + y) % 256) << 16 | (x ^ y) << 8 | y
    val src = ImageCodec.encodePng(7, 4, px)
    val out = ImageCodec.resizeNearestPng(src, 3, 2).get
    // decode the resized PNG and check every pixel against the mapping
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out))
    assert(img.getWidth == 3 && img.getHeight == 2)
    for (x2 <- 0 until 3; y2 <- 0 until 2)
      assert((img.getRGB(x2, y2) & 0xffffff) == px((x2 * 7) / 3, (y2 * 4) / 2),
        s"pixel ($x2,$y2)")
    // upscale hits each source pixel repeatedly, still exact
    val up = ImageCodec.resizeNearestPng(src, 14, 8).get
    val upImg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(up))
    assert((upImg.getRGB(13, 7) & 0xffffff) == px(6, 3))
    // non-image payloads refuse politely
    assert(ImageCodec.resizeNearestPng("nope".getBytes, 2, 2).isEmpty)
  }

  test("dHash56: matches a hand-rolled reference over the same mapping/luma") {
    val w = 5; val h = 4
    def px(x: Int, y: Int): Int =
      (((x * 41 + y * 67) % 256) << 16) | (((x * 89 + y * 13) % 256) << 8) | ((x * 7 + y * 29) % 256)
    val bytes = ImageCodec.encodePng(w, h, px)
    def luma(x2: Int, y2: Int): Int = {
      val p = px((x2 * w) / 9, (y2 * h) / 7)
      (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) + 114 * (p & 0xff)) / 1000
    }
    var expect = 0L
    for (x <- 0 until 8; y <- 0 until 7)
      if (luma(x + 1, y) > luma(x, y)) expect |= 1L << (x * 7 + y)
    assert(ImageCodec.dHash56(bytes).get == expect)
    // 56 bits: always non-negative in a signed long
    assert(ImageCodec.dHash56(bytes).get >= 0L)
  }

  test("dHash56: identical pixels hash equal; a brightness ramp flip changes it; non-images refuse") {
    val a = ImageCodec.encodePng(6, 6, (x, _) => (x * 40) << 16 | (x * 40) << 8 | (x * 40))
    val b = ImageCodec.encodePng(6, 6, (x, _) => { val v = (5 - x) * 40; (v << 16) | (v << 8) | v })
    val ha = ImageCodec.dHash56(a).get
    val hb = ImageCodec.dHash56(b).get
    assert(ha == ImageCodec.dHash56(a).get)
    assert(ha != hb, "reversed ramp must flip comparison bits")
    assert(ImageCodec.dHash56("not an image".getBytes).isEmpty)
  }
}
