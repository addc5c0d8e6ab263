package graft.kernel

import java.io.{DataInputStream, EOFException, InputStream}
import java.util.zip.GZIPInputStream

/** BAM binary codec — no Spark dependencies.
  *
  * Covers the subset the reference uses through htslib (reference:
  * src/include/SAMRecord.hpp:216-313, src/SAMReader.cpp): BGZF
  * container (concatenated gzip members — java.util.zip reads them
  * transparently), little-endian BAM record layout, 4-bit packed
  * sequence ("=ACMGRSVTWYHKDBN"), CIGAR op codes MIDNSHP=X, integer
  * (cCsSiI) and Z string tags for the 11 tracked tag columns, 0xFF
  * qual = absent. Produces the same SamRecord as the SAM text parser,
  * with identical position/mate conventions.
  */
object BamCodec {

  final class BamException(msg: String) extends IllegalArgumentException(msg)

  private val SeqChars = "=ACMGRSVTWYHKDBN"
  private val CigarOps = "MIDNSHP=X"

  final class Reader(raw: InputStream, includeSeqQual: Boolean) extends Iterator[SamCodec.SamRecord] {
    private val in = new DataInputStream(new GZIPInputStream(raw, 65536))
    private var refNames: Array[String] = _
    private var nextRec: SamCodec.SamRecord = _
    private var finished = false

    readHeader()

    private def readLeInt(): Int = Integer.reverseBytes(in.readInt())
    private def readLeShort(): Int = java.lang.Short.reverseBytes(in.readShort()) & 0xffff

    private def readHeader(): Unit = {
      val magic = new Array[Byte](4)
      in.readFully(magic)
      if (!(magic(0) == 'B' && magic(1) == 'A' && magic(2) == 'M' && magic(3) == 1))
        throw new BamException("Invalid BAM magic")
      val lText = readLeInt()
      in.skipNBytes(lText.toLong)
      val nRef = readLeInt()
      refNames = Array.fill(nRef) {
        val lName = readLeInt()
        val name = new Array[Byte](lName)
        in.readFully(name)
        readLeInt() // l_ref unused for text reconstruction
        new String(name, 0, lName - 1, "UTF-8") // strip trailing NUL
      }
    }

    private def refName(id: Int): String =
      if (id < 0 || id >= refNames.length) "*" else refNames(id)

    private def parseOne(): SamCodec.SamRecord = {
      val blockSize =
        try readLeInt()
        catch { case _: EOFException => return null }
      val block = new Array[Byte](blockSize)
      in.readFully(block)
      val b = java.nio.ByteBuffer.wrap(block).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val refId = b.getInt
      val pos0 = b.getInt
      val lReadName = b.get() & 0xff
      val mapq = (b.get() & 0xff).toShort
      b.getShort // bin
      val nCigarOp = b.getShort & 0xffff
      val flags = b.getShort & 0xffff
      val lSeq = b.getInt
      val nextRefId = b.getInt
      val nextPos0 = b.getInt
      val tlen = b.getInt
      val nameBytes = new Array[Byte](lReadName)
      b.get(nameBytes)
      val readId = new String(nameBytes, 0, lReadName - 1, "UTF-8")
      val cigarSb = new StringBuilder
      var refLen = 0L
      for (_ <- 0 until nCigarOp) {
        val enc = b.getInt
        val opLen = enc >>> 4
        val op = CigarOps.charAt(enc & 0xf)
        cigarSb.append(opLen).append(op)
        if (op == 'M' || op == 'D' || op == 'N' || op == '=' || op == 'X') refLen += opLen
      }
      val cigar = if (nCigarOp == 0) "*" else cigarSb.toString
      val seqSb = new StringBuilder(lSeq)
      val seqBytes = new Array[Byte]((lSeq + 1) / 2)
      b.get(seqBytes)
      for (i <- 0 until lSeq) {
        val nib = if (i % 2 == 0) (seqBytes(i / 2) >> 4) & 0xf else seqBytes(i / 2) & 0xf
        seqSb.append(SeqChars.charAt(nib))
      }
      val qualBytes = new Array[Byte](lSeq)
      b.get(qualBytes)
      val qualAbsent = lSeq == 0 || (qualBytes.nonEmpty && (qualBytes(0) & 0xff) == 0xff)

      // tags
      var tagAs, tagXs, tagYs, tagXn, tagXm, tagXo, tagXg, tagNm = Option.empty[Long]
      var tagYt, tagMd, tagSa = Option.empty[String]
      while (b.remaining() > 3) {
        val t1 = b.get().toChar
        val t2 = b.get().toChar
        val typ = b.get().toChar
        val key = s"$t1$t2".toUpperCase
        def readIntVal(): Long = typ match {
          case 'c' => b.get().toLong
          case 'C' => (b.get() & 0xff).toLong
          case 's' => b.getShort.toLong
          case 'S' => (b.getShort & 0xffff).toLong
          case 'i' => b.getInt.toLong
          case 'I' => (b.getInt & 0xffffffffL)
          case _   => 0L
        }
        typ match {
          case 'c' | 'C' | 's' | 'S' | 'i' | 'I' =>
            val v = readIntVal()
            key match {
              case "AS" => tagAs = Some(v); case "XS" => tagXs = Some(v)
              case "YS" => tagYs = Some(v); case "XN" => tagXn = Some(v)
              case "XM" => tagXm = Some(v); case "XO" => tagXo = Some(v)
              case "XG" => tagXg = Some(v); case "NM" => tagNm = Some(v)
              case _    =>
            }
          case 'Z' | 'H' =>
            val sb = new StringBuilder
            var c = b.get()
            while (c != 0) { sb.append(c.toChar); c = b.get() }
            key match {
              case "YT" => tagYt = Some(sb.toString)
              case "MD" => tagMd = Some(sb.toString)
              case "SA" => tagSa = Some(sb.toString)
              case _    =>
            }
          case 'A' => b.get()
          case 'f' => b.getFloat
          case 'B' =>
            val sub = b.get().toChar
            val n = b.getInt
            val width = sub match {
              case 'c' | 'C' => 1; case 's' | 'S' => 2; case 'i' | 'I' | 'f' => 4
              case other     => throw new BamException(s"Unknown B subtype $other")
            }
            b.position(b.position() + n * width)
          case other => throw new BamException(s"Unknown tag type $other")
        }
      }

      val position = if (pos0 >= 0) pos0 + 1L else 0L
      val stopPosition =
        if ((flags & 0x4) != 0) 0L
        else {
          val end0 = if (nCigarOp > 0) pos0 + refLen else pos0 + 1L
          if (end0 >= 0) end0 + 1 else 0L
        }
      val mateRef =
        if (nextRefId < 0) "*"
        else if (nextRefId == refId) "="
        else refName(nextRefId)

      var sequence: Option[String] = None
      var qual: Option[Array[Short]] = None
      if (includeSeqQual) {
        val isUnmapped = (flags & 0x4) != 0
        val isPrimary = (flags & 0x100) == 0 && (flags & 0x800) == 0
        if (lSeq == 0 && (isPrimary || isUnmapped))
          throw new SamCodec.SamParseException(
            s"Primary/unmapped read missing sequence (SEQ='*'): $readId")
        sequence = if (lSeq == 0) None else Some(seqSb.toString)
        qual = if (qualAbsent) None
          else Some(qualBytes.map(q => (q & 0xff).toShort))
      }

      SamCodec.SamRecord(readId, flags, refName(refId), position, stopPosition,
        mapq, cigar, mateRef, if (nextPos0 >= 0) nextPos0 + 1L else 0L, tlen,
        tagAs, tagXs, tagYs, tagXn, tagXm, tagXo, tagXg, tagNm,
        tagYt, tagMd, tagSa, sequence, qual)
    }

    def hasNext: Boolean = {
      if (nextRec == null && !finished) {
        nextRec = parseOne()
        if (nextRec == null) finished = true
      }
      nextRec != null
    }

    def next(): SamCodec.SamRecord = {
      if (!hasNext) throw new NoSuchElementException
      val r = nextRec
      nextRec = null
      r
    }

    def close(): Unit = in.close()
  }
}
