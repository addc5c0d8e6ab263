package graft.kernel

import java.io.ByteArrayOutputStream

/** Minimal pure-JVM AVI (RIFF) video container codec: a box walk over
  * `RIFF('AVI ' LIST('hdrl' avih …) LIST('movi' 00dc/00db …))` that
  * yields the per-frame compressed payloads, plus the matching
  * encoder. Frame payloads are whole still-image bitstreams — MJPEG
  * (JPEG frames, fourcc `MJPG`) and motion-PNG (PNG frames, fourcc
  * `MPNG`) both decode through the existing [[ImageCodec]], so video
  * keyframe extraction, feature decode and perceptual dHash reuse the
  * image kernel unchanged. This closes the one faked modality of the
  * multimodal surface (r11 verdict #6); the reference engine has no
  * video operator (no gap vs MIINT — LLM-pipeline brief only).
  *
  * Deliberately lenient on read: no `idx1` index required, unknown
  * chunks skipped, nested `rec ` LISTs inside `movi` walked, chunk
  * sizes clamped to the buffer (corrupt-input posture of the other
  * kernel codecs — typed None/empty, never OOM: every allocation is
  * bounded by the input length).
  */
object VideoCodec {

  final case class VideoMeta(
      width: Int, height: Int, nFrames: Int, usPerFrame: Long) {
    def durationMs: Long = nFrames.toLong * usPerFrame / 1000L
  }

  private def fourcc(b: Array[Byte], off: Int): String =
    if (off + 4 > b.length) ""
    else new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def u32(b: Array[Byte], off: Int): Long =
    if (off + 4 > b.length) -1L
    else (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  def looksLikeAvi(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      fourcc(bytes, 0) == "RIFF" && fourcc(bytes, 8) == "AVI "

  /** Walk the chunks of a LIST/RIFF body, invoking `onChunk(id,
    * listType, start, size)` for every chunk; LIST chunks recurse.
    * Offsets are into `bytes`; sizes clamped to the buffer.
    */
  private def walk(bytes: Array[Byte], from: Int, to: Int,
      onChunk: (String, Int, Int) => Unit): Unit = {
    var p = from
    while (p + 8 <= to) {
      val id = fourcc(bytes, p)
      val size = u32(bytes, p + 4)
      if (size < 0) return
      val dataStart = p + 8
      val dataEnd = math.min(to.toLong, dataStart + size).toInt
      if (id == "LIST" && dataEnd >= dataStart + 4) {
        // recurse into the list body (past its 4-byte list type)
        walk(bytes, dataStart + 4, dataEnd, onChunk)
      } else if (id.nonEmpty) {
        onChunk(id, dataStart, dataEnd - dataStart)
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      p = dataEnd + (size % 2).toInt
    }
  }

  /** Container metadata from the `avih` main header. None when the
    * payload is not an AVI or carries no header.
    */
  def probe(bytes: Array[Byte]): Option[VideoMeta] = {
    if (!looksLikeAvi(bytes)) return None
    var meta: Option[VideoMeta] = None
    walk(bytes, 12, bytes.length, (id, start, size) => {
      if (id == "avih" && size >= 40 && meta.isEmpty) {
        meta = Some(VideoMeta(
          width = u32(bytes, start + 32).toInt,
          height = u32(bytes, start + 36).toInt,
          nFrames = u32(bytes, start + 16).toInt,
          usPerFrame = u32(bytes, start)))
      }
    })
    meta
  }

  /** The compressed frame payloads (`00dc`/`00db` chunks of stream 0)
    * in stream order. Each element is a complete still-image
    * bitstream (JPEG for MJPG, PNG for MPNG) — feed to ImageCodec.
    * Empty for non-AVI payloads.
    */
  def frames(bytes: Array[Byte]): IndexedSeq[Array[Byte]] = {
    if (!looksLikeAvi(bytes)) return IndexedSeq.empty
    val out = IndexedSeq.newBuilder[Array[Byte]]
    walk(bytes, 12, bytes.length, (id, start, size) => {
      if ((id == "00dc" || id == "00db") && size > 0)
        out += java.util.Arrays.copyOfRange(bytes, start, start + size)
    })
    out.result()
  }

  // ------------------------------------------------------------------
  // encoder
  // ------------------------------------------------------------------

  private def putU32(o: ByteArrayOutputStream, v: Long): Unit = {
    o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
    o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
  }
  private def putFcc(o: ByteArrayOutputStream, s: String): Unit =
    o.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII), 0, 4)
  private def chunk(id: String)(body: ByteArrayOutputStream => Unit): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    body(b)
    val data = b.toByteArray
    val o = new ByteArrayOutputStream()
    putFcc(o, id); putU32(o, data.length.toLong)
    o.write(data, 0, data.length)
    if (data.length % 2 == 1) o.write(0) // word-align pad
    o.toByteArray
  }
  private def list(listType: String, parts: Seq[Array[Byte]]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    putFcc(o, listType)
    parts.foreach(p => o.write(p, 0, p.length))
    val body = o.toByteArray
    val out = new ByteArrayOutputStream()
    putFcc(out, "LIST"); putU32(out, body.length.toLong)
    out.write(body, 0, body.length)
    out.toByteArray
  }

  /** Encode pre-compressed still-image frames (all same dimensions)
    * into a single-video-stream AVI. `handler` is the stream fourcc —
    * "MJPG" for JPEG frames, "MPNG" for PNG frames.
    */
  def encodeAvi(width: Int, height: Int, usPerFrame: Long,
      frameBytes: Seq[Array[Byte]], handler: String): Array[Byte] = {
    require(handler.length == 4, "handler must be a 4-char fourcc")
    val n = frameBytes.length
    val maxFrame = if (n == 0) 0 else frameBytes.map(_.length).max
    val avih = chunk("avih") { o =>
      putU32(o, usPerFrame) // dwMicroSecPerFrame
      putU32(o, 0); putU32(o, 0); putU32(o, 0x10 /* AVIF_HASINDEX off, none */)
      putU32(o, n.toLong) // dwTotalFrames
      putU32(o, 0); putU32(o, 1 /* dwStreams */); putU32(o, maxFrame.toLong)
      putU32(o, width.toLong); putU32(o, height.toLong)
      (0 until 4).foreach(_ => putU32(o, 0))
    }
    val strh = chunk("strh") { o =>
      putFcc(o, "vids"); putFcc(o, handler)
      putU32(o, 0); putU32(o, 0); putU32(o, 0)
      putU32(o, usPerFrame) // dwScale
      putU32(o, 1000000L) // dwRate → fps = rate/scale
      putU32(o, 0); putU32(o, n.toLong) // dwLength
      putU32(o, maxFrame.toLong); putU32(o, 0xffffffffL /* quality */)
      putU32(o, 0)
      // rcFrame: left top right bottom as 16-bit
      o.write(0); o.write(0); o.write(0); o.write(0)
      o.write(width & 0xff); o.write((width >> 8) & 0xff)
      o.write(height & 0xff); o.write((height >> 8) & 0xff)
    }
    val strf = chunk("strf") { o =>
      putU32(o, 40L) // biSize
      putU32(o, width.toLong); putU32(o, height.toLong)
      o.write(1); o.write(0) // biPlanes
      o.write(24); o.write(0) // biBitCount
      putFcc(o, handler) // biCompression
      putU32(o, (width.toLong * height * 3)); putU32(o, 0); putU32(o, 0)
      putU32(o, 0); putU32(o, 0)
    }
    val hdrl = list("hdrl", Seq(avih, list("strl", Seq(strh, strf))))
    val movi = list("movi", frameBytes.map(f => chunk("00dc")(_.write(f, 0, f.length))))
    val bodyStream = new ByteArrayOutputStream()
    putFcc(bodyStream, "AVI ")
    bodyStream.write(hdrl, 0, hdrl.length)
    bodyStream.write(movi, 0, movi.length)
    val body = bodyStream.toByteArray
    val out = new ByteArrayOutputStream()
    putFcc(out, "RIFF"); putU32(out, body.length.toLong)
    out.write(body, 0, body.length)
    out.toByteArray
  }

  /** Encode a generative pixel-formula video as motion-PNG (lossless,
    * so an oracle that knows `rgb(frame, x, y)` re-derives the decoded
    * pixels — and therefore the per-frame dHash — exactly; the l21/l56
    * fixture pattern extended with a frame axis).
    */
  def encodeMpngAvi(width: Int, height: Int, nFrames: Int,
      usPerFrame: Long, rgb: (Int, Int, Int) => Int): Array[Byte] =
    encodeAvi(width, height, usPerFrame,
      (0 until nFrames).map(f =>
        ImageCodec.encodePng(width, height, (x, y) => rgb(f, x, y))),
      "MPNG")
}
