package graft.kernel

import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayInputStream

class WarcCodecSpec extends AnyFunSuite {

  private def mkRecord(id: Int, body: String): (Seq[(String, String)], Array[Byte]) =
    (Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> s"https://example.org/p/$id",
      "WARC-Date" -> "2026-01-01T00:00:00Z",
      "Content-Type" -> "application/http;msgtype=response"),
      (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n$body").getBytes("UTF-8"))

  test("plain WARC round-trip: headers, payload bytes, record order") {
    val out = new java.io.ByteArrayOutputStream()
    WarcCodec.write(out, (1 to 3).iterator.map(i => mkRecord(i, s"<p>body $i</p>")),
      gzipPerRecord = false)
    val recs = WarcCodec.records(new ByteArrayInputStream(out.toByteArray)).toVector
    assert(recs.length == 3)
    assert(recs.map(_.index) == Vector(1L, 2L, 3L))
    assert(recs(1).targetUri.contains("https://example.org/p/2"))
    assert(recs(1).warcType.contains("response"))
    assert(new String(recs(2).payload, "UTF-8").endsWith("<p>body 3</p>"))
  }

  test("per-record gzip members decompress as one concatenated stream") {
    val out = new java.io.ByteArrayOutputStream()
    WarcCodec.write(out, (1 to 4).iterator.map(i => mkRecord(i, s"B$i")),
      gzipPerRecord = true)
    val in = WarcCodec.maybeGunzip(new ByteArrayInputStream(out.toByteArray), gz = true)
    val recs = WarcCodec.records(in).toVector
    assert(recs.length == 4)
    assert(recs.map(_.targetUri.get).last == "https://example.org/p/4")
  }

  test("httpSplit: status, lower-cased headers, exact body bytes") {
    val payload = "HTTP/1.1 404 Not Found\r\nContent-Type: text/plain\r\nX-A: b\r\n\r\nhello\r\nworld"
      .getBytes("UTF-8")
    val h = WarcCodec.httpSplit(payload).get
    assert(h.status == 404)
    assert(h.headers("content-type") == "text/plain" && h.headers("x-a") == "b")
    assert(new String(h.body, "UTF-8") == "hello\r\nworld")
    // non-HTTP payloads are None, not an error
    assert(WarcCodec.httpSplit("just some text".getBytes).isEmpty)
    assert(WarcCodec.httpSplit(null).isEmpty)
  }

  test("httpSplit needHeaders=false: same status/body/None gate, empty headers") {
    val payload = "HTTP/1.1 404 Not Found\r\nContent-Type: text/plain\r\nX-A: b\r\n\r\nhello\r\nworld"
      .getBytes("UTF-8")
    val light = WarcCodec.httpSplit(payload, needHeaders = false).get
    val full = WarcCodec.httpSplit(payload).get
    assert(light.status == full.status)
    assert(java.util.Arrays.equals(light.body, full.body))
    assert(light.headers.isEmpty)
    // the Some/None gate (which decides WHICH bytes the payload column
    // carries) must agree with the full parse on every edge
    val edges = Seq(
      "just some text", "HTTP/1.1\r\n\r\nbody", // no status code
      "HTTP/1.1 xyz\r\n\r\nbody", // unparseable code
      "HTTP/1.1 200 OK\nno blank line ever",
      "HTTP/1.1 200\n\nlenient lf-lf", "HTTP/1.1 301 Moved\r\n\r\n")
    edges.foreach { e =>
      val b = e.getBytes("UTF-8")
      val l = WarcCodec.httpSplit(b, needHeaders = false)
      val f = WarcCodec.httpSplit(b)
      assert(l.isDefined == f.isDefined, s"gate diverged on: $e")
      l.zip(f).foreach { case (x, y) =>
        assert(x.status == y.status &&
          java.util.Arrays.equals(x.body, y.body), s"value diverged on: $e")
      }
    }
  }

  test("corrupt input: truncated payload and absurd Content-Length are typed") {
    val out = new java.io.ByteArrayOutputStream()
    WarcCodec.write(out, Iterator(mkRecord(1, "x" * 100)), gzipPerRecord = false)
    val bytes = out.toByteArray
    // truncate mid-payload: the partial trailing record is dropped
    val recs = WarcCodec.records(
      new ByteArrayInputStream(java.util.Arrays.copyOf(bytes, bytes.length - 60))).toVector
    assert(recs.isEmpty)
    // a Content-Length beyond the cap throws typed, never allocates
    val evil = ("WARC/1.0\r\nContent-Length: 99999999999\r\n\r\n").getBytes
    intercept[IllegalArgumentException] {
      WarcCodec.records(new ByteArrayInputStream(evil)).toVector
    }
  }
}
