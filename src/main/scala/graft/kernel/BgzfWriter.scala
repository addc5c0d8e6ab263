package graft.kernel

import java.io.OutputStream
import java.util.zip.{CRC32, Deflater}

/** BGZF block writer — no Spark dependencies.
  *
  * BGZF (the BAM container format) is a series of gzip members, each
  * carrying an FEXTRA "BC" subfield with the total compressed block
  * size minus one, terminated by a fixed 28-byte EOF block. Block
  * payloads are capped below 64 KiB so BSIZE fits in a u16.
  *
  * `level`: deflate level 0–9 (reference COMPRESSION_LEVEL,
  * src/copy_sam.cpp:251-254 and :347-349 — htslib "wb<level>" mode);
  * -1 means the library default (htslib's BAM default is 6 =
  * java.util.zip default).
  */
final class BgzfWriter(out: OutputStream, level: Int = -1) {
  require(level >= -1 && level <= 9,
    s"COMPRESSION_LEVEL must be between 0 and 9, got $level")
  private val buf = new java.io.ByteArrayOutputStream(65536)
  private val MaxPayload = 60000

  def write(bytes: Array[Byte]): Unit = write(bytes, 0, bytes.length)

  def write(bytes: Array[Byte], off: Int, len: Int): Unit = {
    var o = off
    var remaining = len
    while (remaining > 0) {
      val room = MaxPayload - buf.size()
      val n = math.min(room, remaining)
      buf.write(bytes, o, n)
      o += n
      remaining -= n
      if (buf.size() >= MaxPayload) flushBlock()
    }
  }

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def flushBlock(): Unit = {
    if (buf.size() == 0) return
    val payload = buf.toByteArray
    buf.reset()
    val deflater = new Deflater(
      if (level < 0) Deflater.DEFAULT_COMPRESSION else level, /*nowrap=*/ true)
    deflater.setInput(payload)
    deflater.finish()
    val compressed = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) {
      val n = deflater.deflate(tmp)
      compressed.write(tmp, 0, n)
    }
    deflater.end()
    val cdata = compressed.toByteArray
    val crc = new CRC32()
    crc.update(payload)
    // gzip member: header(12) + XLEN extra "BC"(6) + cdata + crc32 + isize
    val bsize = 12 + 6 + cdata.length + 8 // total block size
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 4, 0, 0, 0, 0, 0, 0xff.toByte))
    out.write(le16(6)) // XLEN
    out.write(Array[Byte]('B', 'C', 2, 0))
    out.write(le16(bsize - 1))
    out.write(cdata)
    out.write(le32(crc.getValue))
    out.write(le32(payload.length.toLong))
  }

  /** Standard BGZF EOF marker block. */
  private val EofBlock: Array[Byte] = Array(
    0x1f, 0x8b, 0x08, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00, 0xff,
    0x06, 0x00, 0x42, 0x43, 0x02, 0x00, 0x1b, 0x00, 0x03, 0x00,
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00).map(_.toByte)

  def close(): Unit = {
    flushBlock()
    out.write(EofBlock)
    out.close()
  }
}
