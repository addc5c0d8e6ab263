package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Corrupt-input robustness for the r12 container codecs (AVI video,
  * WARC web-archive): any truncation prefix and any single flipped
  * byte must either decode (benign corruption) or raise promptly —
  * never hang, recurse unboundedly, or allocate an executor-killing
  * buffer. Same contract as CodecRobustnessSpec pins for the CRAM
  * kernels: at 100 TB one corrupt shard = one typed task error.
  */
class ContainerRobustnessSpec extends AnyFunSuite {

  private def survives(body: => Unit): Unit =
    try body
    catch { case _: Exception => () }

  private lazy val avi: Array[Byte] =
    VideoCodec.encodeMpngAvi(6, 5, 3, 40000L, (f, x, y) => f * 31 + x * 7 + y)

  private lazy val warc: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    WarcCodec.write(out, (1 to 5).iterator.map { i =>
      (Seq("WARC-Type" -> "resource", "WARC-Target-URI" -> s"u://$i",
        "Content-Type" -> "text/plain"), ("x" * (20 + i)).getBytes)
    }, gzipPerRecord = false)
    out.toByteArray
  }

  test("AVI: every truncation prefix decodes or fails promptly") {
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    for (k <- 0 until avi.length) {
      survives { VideoCodec.probe(java.util.Arrays.copyOf(avi, k)) }
      survives { VideoCodec.frames(java.util.Arrays.copyOf(avi, k)).foreach(_ => ()) }
      assert(System.nanoTime() < deadline, s"AVI truncation at $k too slow")
    }
  }

  test("AVI: every single-byte flip decodes or fails promptly, bounded alloc") {
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    for (pos <- avi.indices; bit <- Seq(0, 7)) {
      val m = avi.clone(); m(pos) = (m(pos) ^ (1 << bit)).toByte
      survives { VideoCodec.frames(m).foreach(f => assert(f.length <= avi.length)) }
      assert(System.nanoTime() < deadline, s"AVI flip at $pos too slow")
    }
  }

  test("WARC: every truncation prefix decodes or fails promptly") {
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    for (k <- 0 until warc.length) {
      survives {
        WarcCodec.records(new java.io.ByteArrayInputStream(
          java.util.Arrays.copyOf(warc, k))).foreach(_ => ())
      }
      assert(System.nanoTime() < deadline, s"WARC truncation at $k too slow")
    }
  }

  test("WARC: every single-byte flip decodes or fails promptly, bounded alloc") {
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    for (pos <- warc.indices; bit <- Seq(0, 7)) {
      val m = warc.clone(); m(pos) = (m(pos) ^ (1 << bit)).toByte
      survives {
        WarcCodec.records(new java.io.ByteArrayInputStream(m))
          .foreach(r => assert(r.payload.length <= WarcCodec.MaxRecordBytes))
      }
      assert(System.nanoTime() < deadline, s"WARC flip at $pos too slow")
    }
  }

  test("gzipped WARC: flips in the compressed stream fail promptly") {
    val out = new java.io.ByteArrayOutputStream()
    WarcCodec.write(out, (1 to 3).iterator.map { i =>
      (Seq("WARC-Type" -> "resource", "WARC-Target-URI" -> s"u://$i"),
        ("y" * 40).getBytes)
    }, gzipPerRecord = true)
    val gz = out.toByteArray
    for (pos <- gz.indices) {
      val m = gz.clone(); m(pos) = (m(pos) ^ 1).toByte
      survives {
        val in = WarcCodec.maybeGunzip(new java.io.ByteArrayInputStream(m), gz = true)
        try WarcCodec.records(in).foreach(_ => ()) finally in.close()
      }
    }
  }
}
