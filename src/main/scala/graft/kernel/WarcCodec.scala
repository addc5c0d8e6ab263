package graft.kernel

import java.io.{BufferedInputStream, ByteArrayOutputStream, EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** WARC (Web ARChive, ISO 28500) record codec — the container format
  * web-crawl corpora (Common Crawl et al.) ship in, i.e. the raw input
  * of a real LLM training-data ingest at 100 TB. Pure JVM, streaming:
  * one record at a time, allocation bounded by the record's declared
  * Content-Length (clamped), never the file.
  *
  * Layout per record: a `WARC/1.x\r\n` version line, `Name: value`
  * header lines, a blank line, Content-Length payload bytes, and a
  * `\r\n\r\n` separator. Compressed WARCs are per-record gzip MEMBERS
  * concatenated into one file (the Common Crawl convention);
  * `java.util.zip.GZIPInputStream` reads concatenated members
  * transparently, so the same sequential parser serves both forms.
  * Lenient on read: unknown headers carried verbatim, blank-line runs
  * between records skipped, and a truncated trailing record is DROPPED
  * (every complete record before it is returned; the partial one is
  * not) rather than raised as an error — the corrupt-input posture of
  * the other kernel codecs.
  */
object WarcCodec {

  /** `\r?\n` compiled once — this split runs per HTTP payload (r14). */
  private val CrLf = java.util.regex.Pattern.compile("\\r?\\n")

  /** Hard per-record allocation cap (1 GiB): a corrupt Content-Length
    * must not OOM the task. Typical crawl records are well under 1 MB.
    */
  val MaxRecordBytes: Long = 1L << 30

  final case class WarcRecord(
      index: Long,
      headers: Map[String, String],
      payload: Array[Byte]) {
    private def h(name: String): Option[String] =
      headers.get(name.toLowerCase)
    def warcType: Option[String] = h("warc-type")
    def targetUri: Option[String] = h("warc-target-uri")
    def recordId: Option[String] = h("warc-record-id")
    def date: Option[String] = h("warc-date")
    def contentType: Option[String] = h("content-type")
  }

  /** status code + headers + body of an `application/http` payload;
    * None when the payload does not start with an HTTP status line.
    */
  final case class HttpPayload(
      status: Int, headers: Map[String, String], body: Array[Byte])

  def looksLikeGzip(path: String): Boolean = path.endsWith(".gz")

  def maybeGunzip(in: InputStream, gz: Boolean): InputStream =
    // r15: buffer the DECOMPRESSED side too — the header parser reads
    // byte-at-a-time, and GZIPInputStream.read() is one native inflate
    // call per byte (InflaterInputStream has no output-side buffer):
    // ~150 header bytes × 500k records = ~75M native calls at the x19
    // bench point, the measured majority of the scan stage's residual
    // after the html kernel. The inner BufferedInputStream still
    // batches the COMPRESSED reads.
    if (gz) new BufferedInputStream(
      new GZIPInputStream(new BufferedInputStream(in), 64 * 1024), 64 * 1024)
    else new BufferedInputStream(in)

  /** Read one `\n`-terminated line (CR stripped), ISO-8859-1. Null at
    * EOF with nothing read. Plain growable array, not
    * ByteArrayOutputStream — BAOS.write is synchronized per byte and
    * JDK 17 has no biased locking to elide the lock (r15).
    */
  private def readLine(in: InputStream): String = {
    var buf = new Array[Byte](96)
    var n = 0
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') {
      if (n == buf.length) buf = java.util.Arrays.copyOf(buf, n * 2)
      buf(n) = b.toByte; n += 1
      b = in.read()
    }
    if (n > 0 && buf(n - 1) == '\r') n -= 1
    new String(buf, 0, n, StandardCharsets.ISO_8859_1)
  }

  private def readFully(in: InputStream, len: Int): Array[Byte] = {
    val out = new Array[Byte](len)
    var off = 0
    while (off < len) {
      val n = in.read(out, off, len - off)
      if (n < 0) throw new EOFException(s"WARC payload truncated at $off/$len")
      off += n
    }
    out
  }

  /** Streaming record iterator over an (already decompressed) WARC
    * stream. The caller owns the stream's lifetime.
    */
  def records(in: InputStream): Iterator[WarcRecord] = new Iterator[WarcRecord] {
    private var nextRec: WarcRecord = null
    private var idx = 0L
    private var done = false

    private def advance(): Unit = {
      if (done || nextRec != null) return
      // skip blank lines / junk until a version line or EOF
      var line = readLine(in)
      while (line != null && !line.startsWith("WARC/")) line = readLine(in)
      if (line == null) { done = true; return }
      val headers = Map.newBuilder[String, String]
      var hl = readLine(in)
      while (hl != null && hl.nonEmpty) {
        val i = hl.indexOf(':')
        if (i > 0)
          headers += hl.substring(0, i).trim.toLowerCase -> hl.substring(i + 1).trim
        hl = readLine(in)
      }
      val hmap = headers.result()
      val len = hmap.get("content-length").flatMap(s =>
        scala.util.Try(s.toLong).toOption).getOrElse(0L)
      if (len < 0 || len > MaxRecordBytes)
        throw new IllegalArgumentException(s"WARC Content-Length out of range: $len")
      val payload =
        try readFully(in, len.toInt)
        catch { case _: EOFException => done = true; return }
      idx += 1
      nextRec = WarcRecord(idx, hmap, payload)
    }

    override def hasNext: Boolean = { advance(); nextRec != null }
    override def next(): WarcRecord = {
      advance()
      if (nextRec == null) throw new NoSuchElementException("WARC: no more records")
      val r = nextRec; nextRec = null; r
    }
  }

  /** Split an `application/http` payload into status/headers/body.
    * None when the payload does not start with `HTTP/` (or its status
    * line has no parseable code).
    *
    * `needHeaders = false` (r15): skip the header-map construction —
    * the status-line parse and the body slice are unchanged (the
    * Some/None decision gates which bytes the `payload` column
    * carries, so they are semantics; the map only feeds
    * `http_content_type`, which readers prune). The headers field is
    * then empty.
    */
  def httpSplit(payload: Array[Byte]): Option[HttpPayload] =
    httpSplit(payload, needHeaders = true)

  def httpSplit(payload: Array[Byte], needHeaders: Boolean): Option[HttpPayload] = {
    if (payload == null || payload.length < 12) return None
    val head = new String(payload, 0, math.min(payload.length, 8), StandardCharsets.ISO_8859_1)
    if (!head.startsWith("HTTP/")) return None
    // find header/body boundary: \r\n\r\n (or lenient \n\n)
    var i = 0
    var boundary = -1
    var bodyStart = -1
    while (boundary < 0 && i < payload.length - 1) {
      if (payload(i) == '\n') {
        if (i + 1 < payload.length && payload(i + 1) == '\n') {
          boundary = i; bodyStart = i + 2
        } else if (i + 2 < payload.length && payload(i + 1) == '\r' &&
            payload(i + 2) == '\n') {
          boundary = i; bodyStart = i + 3
        }
      }
      i += 1
    }
    if (boundary < 0) { boundary = payload.length; bodyStart = payload.length }
    if (!needHeaders) {
      // first line only — identical status semantics, no header text /
      // regex split / map (one String + split per record instead of
      // the whole header block's)
      var eol = 0
      while (eol < boundary && payload(eol) != '\n') eol += 1
      var end = eol
      if (end > 0 && payload(end - 1) == '\r') end -= 1
      val sl = new String(payload, 0, end, StandardCharsets.ISO_8859_1)
      val status = sl.split(" ").lift(1)
        .flatMap(s => scala.util.Try(s.trim.toInt).toOption)
        .getOrElse(return None)
      return Some(HttpPayload(status, Map.empty,
        java.util.Arrays.copyOfRange(payload, bodyStart, payload.length)))
    }
    val headerText = new String(payload, 0, boundary, StandardCharsets.ISO_8859_1)
    val lines = CrLf.split(headerText) // compiled once: String.split(regex) re-compiles per call (r14)
    val status = lines.headOption.flatMap { sl =>
      sl.split(" ").lift(1).flatMap(s => scala.util.Try(s.trim.toInt).toOption)
    }.getOrElse(return None)
    val hdrs = lines.drop(1).flatMap { l =>
      val j = l.indexOf(':')
      if (j > 0) Some(l.substring(0, j).trim.toLowerCase -> l.substring(j + 1).trim)
      else None
    }.toMap
    Some(HttpPayload(status,
      hdrs, java.util.Arrays.copyOfRange(payload, bodyStart, payload.length)))
  }

  // ------------------------------------------------------------------
  // writer (fixtures + COPY)
  // ------------------------------------------------------------------

  /** Serialize one record (uncompressed form). Header order preserved;
    * Content-Length computed here.
    */
  def encodeRecord(headers: Seq[(String, String)], payload: Array[Byte],
      version: String = "WARC/1.0"): Array[Byte] = {
    val o = new ByteArrayOutputStream(payload.length + 256)
    def w(s: String): Unit = o.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w(version); w("\r\n")
    headers.filterNot(_._1.equalsIgnoreCase("Content-Length")).foreach {
      case (k, v) => w(k); w(": "); w(v); w("\r\n")
    }
    w("Content-Length: "); w(payload.length.toString); w("\r\n\r\n")
    o.write(payload)
    w("\r\n\r\n")
    o.toByteArray
  }

  /** One complete gzip member for `bytes` (closed stream — the
    * Deflater's native resources are released per member).
    */
  def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bo = new ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new GZIPOutputStream(bo)
    gz.write(bytes)
    gz.close()
    bo.toByteArray
  }

  /** Write records to `out`; `gzipPerRecord` emits one gzip member per
    * record (the Common Crawl convention — a reader can seek to a
    * member and decompress a single record).
    */
  def write(out: OutputStream,
      recs: Iterator[(Seq[(String, String)], Array[Byte])],
      gzipPerRecord: Boolean): Unit = {
    recs.foreach { case (hdrs, payload) =>
      val bytes = encodeRecord(hdrs, payload)
      if (gzipPerRecord) out.write(gzipMember(bytes))
      else out.write(bytes)
    }
    out.flush()
  }
}
