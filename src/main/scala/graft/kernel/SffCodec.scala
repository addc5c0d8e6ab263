package graft.kernel

import java.nio.{ByteBuffer, ByteOrder}

/** 454/Roche SFF binary codec — no Spark dependencies.
  *
  * Ported from the reference's reader (reference: src/SFFReader
  * .cpp:33-301): big-endian fixed 31-byte header (magic 0x2E736666,
  * version 0.0.0.1, flowgram format 1), per-read headers with 1-based
  * clip points (0 = no clip), qual+adapter trim with overlapping clips
  * → empty sequence, index block skipping, 8-byte padding, raw Phred
  * (0–93) qualities, strict truncation/bounds errors.
  */
object SffCodec {

  final class SffException(msg: String) extends IllegalArgumentException(msg)

  final case class SffRead(name: String, bases: String, quals: Array[Short])

  private val Magic = 0x2e736666
  private val MaxSeqLen = 10000000

  private def pad8(n: Long): Long = (n + 7) & ~7L

  /** Parse a whole SFF file image into trimmed/untrimmed reads. */
  def parse(bytes: Array[Byte], path: String, trim: Boolean = true): Vector[SffRead] = {
    if (bytes.length < 31)
      throw new SffException(
        s"SFF file too small for header (${bytes.length} bytes): $path")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val magic = buf.getInt(0)
    if (magic != Magic)
      throw new SffException(
        f"Invalid SFF magic number (expected 0x2E736666, got 0x$magic%08X): $path")
    if (bytes(4) != 0 || bytes(5) != 0 || bytes(6) != 0 || bytes(7) != 1)
      throw new SffException(
        s"Unsupported SFF version (expected 0.0.0.1, got ${bytes(4)}.${bytes(5)}.${bytes(6)}.${bytes(7)}): $path")
    val indexOffset = buf.getLong(8)
    val indexLength = buf.getInt(16) & 0xffffffffL
    val numReads = buf.getInt(20) & 0xffffffffL
    val headerLength = buf.getShort(24) & 0xffff
    val keyLength = buf.getShort(26) & 0xffff
    val numFlows = buf.getShort(28) & 0xffff
    val flowgramFormat = bytes(30) & 0xff
    if (flowgramFormat != 1)
      throw new SffException(
        s"Unsupported SFF flowgram format code (expected 1, got $flowgramFormat): $path")

    var pos = headerLength.toLong
    val paddedIndexLength = if (indexLength > 0) pad8(indexLength) else 0L
    var indexSkipped = indexOffset == 0
    val out = Vector.newBuilder[SffRead]
    var i = 0L
    var eof = false
    while (i < numReads && !eof) {
      if (!indexSkipped && pos >= indexOffset) {
        pos = indexOffset + paddedIndexLength
        indexSkipped = true
      }
      val headerStart = pos
      if (pos + 16 > bytes.length) {
        // overclaimed read count: stop gracefully at EOF boundary
        // (reference test: "handles overclaimed read count gracefully")
        if (pos == bytes.length) eof = true
        else throw new SffException(
          s"SFF file truncated reading read header at position $headerStart: $path")
      } else {
        val readHeaderLength = buf.getShort(pos.toInt) & 0xffff
        val nameLength = buf.getShort(pos.toInt + 2) & 0xffff
        val seqLen = buf.getInt(pos.toInt + 4) & 0xffffffffL
        val clipQualLeft = buf.getShort(pos.toInt + 8) & 0xffff
        val clipQualRight = buf.getShort(pos.toInt + 10) & 0xffff
        val clipAdapterLeft = buf.getShort(pos.toInt + 12) & 0xffff
        val clipAdapterRight = buf.getShort(pos.toInt + 14) & 0xffff
        if (seqLen > MaxSeqLen)
          throw new SffException(
            s"SFF read at position $headerStart has seq_len=$seqLen which exceeds " +
              s"maximum ($MaxSeqLen), file is likely corrupted: $path")
        for ((nm, v) <- Seq("clip_qual_left" -> clipQualLeft,
          "clip_qual_right" -> clipQualRight,
          "clip_adapter_left" -> clipAdapterLeft,
          "clip_adapter_right" -> clipAdapterRight))
          if (v > seqLen)
            throw new SffException(
              s"SFF read at position $headerStart has $nm=$v > seq_len=$seqLen: $path")
        if (pos + 16 + nameLength > bytes.length)
          throw new SffException(
            s"SFF file truncated reading read name at position $headerStart: $path")
        val name = new String(bytes, pos.toInt + 16, nameLength, "UTF-8")
        pos = headerStart + readHeaderLength

        // data section: flowgram (2B × flows) + flow_index + bases + quals
        val dataStart = pos
        val basesOff = dataStart + numFlows * 2L + seqLen
        val qualsOff = basesOff + seqLen
        if (qualsOff + seqLen > bytes.length)
          throw new SffException(
            s"SFF file truncated reading sequence data at position $dataStart: $path")
        var bases = new String(bytes, basesOff.toInt, seqLen.toInt, "UTF-8")
        var quals = new Array[Short](seqLen.toInt)
        var qi = 0
        while (qi < seqLen) {
          quals(qi) = (bytes(qualsOff.toInt + qi) & 0xff).toShort
          qi += 1
        }
        pos = dataStart + pad8(numFlows * 2L + seqLen * 3L)

        if (trim) {
          val left1 = math.max(if (clipQualLeft > 0) clipQualLeft else 1,
            if (clipAdapterLeft > 0) clipAdapterLeft else 1)
          val effLeft = left1 - 1
          val effRight = math.min(
            if (clipQualRight > 0) clipQualRight else seqLen.toInt,
            if (clipAdapterRight > 0) clipAdapterRight else seqLen.toInt)
          if (effLeft >= effRight) { bases = ""; quals = Array.empty }
          else {
            bases = bases.substring(effLeft, effRight)
            quals = quals.slice(effLeft, effRight)
          }
        }
        out += SffRead(name, bases, quals)
        i += 1
      }
    }
    out.result()
  }
}
