package graft.kernel

import java.io.InputStream
import scala.collection.mutable

/** Pure-JVM CRAM 2.0-4.0 decoder — block compression: raw, gzip,
  * bzip2, lzma, rANS4x8, rANSNx16, adaptive arithmetic
  * ([[ArithDynamic]]), fqzcomp qualities ([[FqzComp]]) and tok3 read
  * names ([[NameTok3]]); EXTERNAL / HUFFMAN / BETA / GAMMA /
  * BYTE_ARRAY_LEN / BYTE_ARRAY_STOP encodings; reference-based and
  * embedded-reference sequence reconstruction; in-slice mate
  * resolution. Decodes to [[SamCodec.SamRecord]] via SAM text so every
  * normalization rule (mate-reference '=', stop_position, tag subset)
  * is shared with the SAM/BAM paths by construction.
  *
  * Written against the public CRAM 3.0/3.1 specifications;
  * container/slice layout, canonical-Huffman tie-breaking, the
  * substitution-matrix bit packing, rANS frequency-table RLE and the
  * mate/TLEN resolution semantics cross-checked against the
  * reference's vendored htslib (reference:
  * ext/htslib-1.22.1/cram/cram_decode.c:2077-2232,
  * cram/cram_codecs.c:2604-2925, htscodecs/htscodecs/rANS_static.c).
  * All three 3.1 encoder profiles (normal/small/archive), the 2.x
  * layout (ITF8 record counters, CRC-less containers/blocks,
  * reference: cram/cram_io.c:3810-3870, cram/cram_decode.c:995-999)
  * and the draft 4.0 layout (varint containers, zig-zag signed ids,
  * VARINT/CONST codecs, QO orientation, MD/NM placeholder tags,
  * reference: cram/cram_codecs.c:644-805, cram/cram_decode.c:
  * 2000-2031,2873) are covered end-to-end by Cram31Spec. 4.x subset
  * note: alignment/mate positions are decoded through the 32-bit
  * path (BAM's own coordinate cap); template length takes the full
  * 64-bit varint.
  *
  * Scale note: decoding is stream-per-file with bounded memory (one
  * container at a time); the reference FASTA is loaded once per reader
  * — the same per-process cost htslib pays. Multi-file parallelism
  * comes from the source's one-partition-per-file planning.
  */
object CramCodec {

  final class CramException(msg: String) extends IllegalArgumentException(msg)

  // ------------------------------------------------------------------
  // primitive readers
  // ------------------------------------------------------------------

  final class ByteReader(val buf: Array[Byte], var pos: Int = 0) {
    def remaining: Int = buf.length - pos
    def u8(): Int = { val v = buf(pos) & 0xFF; pos += 1; v }
    def bytes(n: Int): Array[Byte] = {
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; out
    }
    def i32le(): Int = {
      val v = (buf(pos) & 0xFF) | ((buf(pos + 1) & 0xFF) << 8) |
        ((buf(pos + 2) & 0xFF) << 16) | ((buf(pos + 3) & 0xFF) << 24)
      pos += 4; v
    }
    /** ITF8: 1-5 bytes, 32-bit signed. */
    def itf8(): Int = {
      val b0 = u8()
      if (b0 < 0x80) b0
      else if (b0 < 0xC0) ((b0 & 0x7F) << 8) | u8()
      else if (b0 < 0xE0) ((b0 & 0x3F) << 16) | (u8() << 8) | u8()
      else if (b0 < 0xF0) ((b0 & 0x1F) << 24) | (u8() << 16) | (u8() << 8) | u8()
      else ((b0 & 0x0F) << 28) | (u8() << 20) | (u8() << 12) | (u8() << 4) | (u8() & 0x0F)
    }
    /** LTF8: 1-9 bytes, 64-bit signed. */
    def ltf8(): Long = {
      val b0 = u8()
      var n = 0
      while (n < 8 && (b0 & (0x80 >> n)) != 0) n += 1
      var v: Long = if (n < 8) (b0 & (0xFF >> (n + 1))).toLong else 0L
      var i = 0
      while (i < n) { v = (v << 8) | u8(); i += 1 }
      v
    }
    /** CRAM 4.x big-endian 7-bit varint (reference: htscodecs varint.h
      * BIG_END var_get_u32; cram_io.c:5255 cram_init_varint). */
    def u7(): Int = {
      var v = 0; var c = 0
      while ({ c = u8(); v = (v << 7) | (c & 0x7f); (c & 0x80) != 0 }) ()
      v
    }
    def u7l(): Long = {
      var v = 0L; var c = 0
      while ({ c = u8(); v = (v << 7) | (c & 0x7f); (c & 0x80) != 0 }) ()
      v
    }
    /** Zig-zag signed variants (var_get_s32/s64). */
    def u7s(): Int = { val v = u7(); (v >>> 1) ^ -(v & 1) }
    def u7ls(): Long = { val v = u7l(); (v >>> 1) ^ -(v & 1L) }
    /** Version-aware integer reads: ITF8/LTF8 through 3.x, varint in 4.x. */
    def vi(v4: Boolean): Int = if (v4) u7() else itf8()
    def vis(v4: Boolean): Int = if (v4) u7s() else itf8()
    def vl(v4: Boolean): Long = if (v4) u7l() else ltf8()
  }

  /** MSB-first bit reader over the core block. */
  final class BitReader(buf: Array[Byte]) {
    private var bytePos = 0
    private var bitPos = 0
    def bit(): Int = {
      val v = (buf(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      v
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
  }

  // ------------------------------------------------------------------
  // block decompression
  // ------------------------------------------------------------------

  private def gunzip(data: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(data))
    try in.readAllBytes() finally in.close()
  }

  /** rANS 4x8 (CRAM 3.0), orders 0 and 1; 12-bit frequencies, 4
    * interleaved states, lower renormalization bound 2^23.
    */
  def ransDecode(data: Array[Byte]): Array[Byte] = {
    val r = new ByteReader(data)
    val order = r.u8()
    r.i32le() // compressed size (payload after the 9-byte header)
    val outSz = r.i32le()
    val out = new Array[Byte](outSz)
    if (outSz == 0) return out
    if (order == 0) ransDecode0(r, out)
    else if (order == 1) ransDecode1(r, out)
    else throw new CramException(s"rANS order $order not supported")
    out
  }

  private def readRansFreq(r: ByteReader): Int = {
    val b0 = r.u8()
    if (b0 >= 128) ((b0 & 0x7F) << 8) | r.u8() else b0
  }

  /** One frequency table: symbol list is RLE'd (a symbol equal to
    * previous+1 introduces a run-length byte); terminated by symbol 0.
    * Returns freq + cumulative-start arrays and a 4096-slot reverse
    * lookup. `zeroMeansTotal`: order-1 writes freq 0 for a
    * context-certain symbol, meaning the full 4096.
    */
  private def readFreqTable(r: ByteReader, zeroMeansTotal: Boolean)
      : (Array[Int], Array[Int], Array[Byte]) = {
    val freq = new Array[Int](256)
    val cum = new Array[Int](256)
    val lookup = new Array[Byte](4096)
    var x = 0
    var sym = r.u8()
    var rle = 0
    var done = false
    while (!done) {
      var f = readRansFreq(r)
      if (f == 0 && zeroMeansTotal) f = 4096
      freq(sym) = f
      cum(sym) = x
      if (x + f > 4096) throw new CramException("rANS frequency overflow")
      java.util.Arrays.fill(lookup, x, x + f, sym.toByte)
      x += f
      if (rle > 0) { rle -= 1; sym += 1 }
      else {
        val next = r.u8()
        if (next == sym + 1) { sym = next; rle = r.u8() }
        else sym = next
      }
      if (rle == 0 && sym == 0) done = true
    }
    // historically encoders fill 4095 of 4096
    if (x < 4095) throw new CramException(s"rANS frequencies sum to $x")
    if (x == 4095) lookup(4095) = lookup(4094)
    (freq, cum, lookup)
  }

  private final val RansLow = 1 << 23

  private def ransDecode0(r: ByteReader, out: Array[Byte]): Unit = {
    val (freq, cum, lookup) = readFreqTable(r, zeroMeansTotal = false)
    val states = new Array[Long](4)
    var j = 0
    while (j < 4) { states(j) = r.i32le() & 0xFFFFFFFFL; j += 1 }
    var i = 0
    val n = out.length
    while (i < n) {
      val s = i & 3
      var st = states(s)
      val m = (st & 0xFFF).toInt
      val sym = lookup(m) & 0xFF
      out(i) = sym.toByte
      st = freq(sym) * (st >> 12) + m - cum(sym)
      while (st < RansLow && r.remaining > 0) st = (st << 8) | r.u8()
      states(s) = st
      i += 1
    }
  }

  private def ransDecode1(r: ByteReader, out: Array[Byte]): Unit = {
    val freq = new Array[Array[Int]](256)
    val cum = new Array[Array[Int]](256)
    val lookup = new Array[Array[Byte]](256)
    var ctx = r.u8()
    var rle = 0
    var done = false
    while (!done) {
      val (f, c, l) = readFreqTable(r, zeroMeansTotal = true)
      freq(ctx) = f; cum(ctx) = c; lookup(ctx) = l
      if (rle > 0) { rle -= 1; ctx += 1 }
      else {
        val next = r.u8()
        if (next == ctx + 1) { ctx = next; rle = r.u8() }
        else ctx = next
      }
      if (rle == 0 && ctx == 0) done = true
    }
    val empty = (new Array[Int](256), new Array[Int](256), new Array[Byte](4096))
    var k = 0
    while (k < 256) {
      if (freq(k) == null) { freq(k) = empty._1; cum(k) = empty._2; lookup(k) = empty._3 }
      k += 1
    }
    val states = new Array[Long](4)
    var j = 0
    while (j < 4) { states(j) = r.i32le() & 0xFFFFFFFFL; j += 1 }
    val n = out.length
    val q = n >> 2
    val posArr = Array(0, q, 2 * q, 3 * q)
    val last = new Array[Int](4)
    var i = 0
    while (i < q) {
      var s = 0
      while (s < 4) {
        val l = last(s)
        var st = states(s)
        val m = (st & 0xFFF).toInt
        val sym = lookup(l)(m) & 0xFF
        out(posArr(s) + i) = sym.toByte
        st = freq(l)(sym) * (st >> 12) + m - cum(l)(sym)
        while (st < RansLow && r.remaining > 0) st = (st << 8) | r.u8()
        states(s) = st
        last(s) = sym
        s += 1
      }
      i += 1
    }
    // stream 3 finishes the remainder (out length not divisible by 4)
    var p = 3 * q + q
    while (p < n) {
      val l = last(3)
      var st = states(3)
      val m = (st & 0xFFF).toInt
      val sym = lookup(l)(m) & 0xFF
      out(p) = sym.toByte
      st = freq(l)(sym) * (st >> 12) + m - cum(l)(sym)
      while (st < RansLow && r.remaining > 0) st = (st << 8) | r.u8()
      states(3) = st
      last(3) = sym
      p += 1
    }
  }

  // ------------------------------------------------------------------
  // containers and blocks
  // ------------------------------------------------------------------

  private final case class Block(method: Int, contentType: Int, contentId: Int,
      data: Array[Byte])

  private def readBlock(r: ByteReader, major: Int = 3): Block = {
    val v4 = major >= 4
    val method = r.u8()
    val ctype = r.u8()
    val cid = r.vi(v4)
    val csize = r.vi(v4)
    val rsize = r.vi(v4)
    val raw = r.bytes(csize)
    if (major >= 3) r.pos += 4 // crc32 (not verified; absent in CRAM 2.x)
    val data = decompressBlock(method, raw, rsize)
    if (data.length != rsize)
      throw new CramException(s"block decompressed to ${data.length}, expected $rsize")
    Block(method, ctype, cid, data)
  }

  /** CRAM block payload decompression by method id (CRAM 3.0 §8:
    * 0 raw, 1 gzip, 2 bzip2, 3 lzma, 4 rANS4x8, 5 rANSNx16).
    * Package-visible so the spec can drive each codec with real
    * compressed payloads without authoring full containers.
    */
  private[kernel] def decompressBlock(method: Int, raw: Array[Byte], rsize: Int): Array[Byte] =
    method match {
      case 0 => raw
      case 1 => gunzip(raw)
      case 2 => // bzip2 via commons-compress (on Spark's classpath)
        val bis = new org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream(
          new java.io.ByteArrayInputStream(raw))
        try bis.readAllBytes() finally bis.close()
      case 3 => // lzma via commons-compress + xz (both on Spark's classpath)
        val lis = new org.apache.commons.compress.compressors.lzma.LZMACompressorInputStream(
          new java.io.ByteArrayInputStream(raw))
        try lis.readAllBytes() finally lis.close()
      case 4 => if (raw.isEmpty) new Array[Byte](0) else ransDecode(raw)
      case 5 => // rANSNx16 (kernel/RansNx16, golden-tested vs htscodecs vectors)
        if (raw.isEmpty) new Array[Byte](0) else RansNx16.decode(raw, 0, raw.length, rsize)
      case 6 => // adaptive arithmetic, CRAM 3.1 (kernel/ArithDynamic, golden-tested)
        if (raw.isEmpty) new Array[Byte](0) else ArithDynamic.decode(raw, 0, raw.length, rsize)
      case 7 => // fqzcomp quality model, CRAM 3.1 (kernel/FqzComp, golden-tested)
        if (raw.isEmpty) new Array[Byte](0) else FqzComp.decode(raw, rsize)
      case 8 => // tok3 name tokeniser, CRAM 3.1 (kernel/NameTok3, golden-tested)
        if (raw.isEmpty) new Array[Byte](0) else NameTok3.decode(raw)
      case m =>
        throw new CramException(s"CRAM block compression method $m is outside the " +
          "supported subset (raw, gzip, bzip2, lzma, rANS4x8, rANSNx16, arith, fqzcomp, tok3)")
    }

  private final case class ContainerHeader(length: Int, refId: Int, start: Int,
      span: Int, nRecords: Int, counter: Long, nBlocks: Int)

  private def streamByte(in: InputStream): Int = {
    val b = in.read()
    if (b < 0) throw new CramException("truncated container header")
    b
  }
  private def streamItf8(in: InputStream): Int = {
    val b0 = streamByte(in)
    if (b0 < 0x80) b0
    else if (b0 < 0xC0) ((b0 & 0x7F) << 8) | streamByte(in)
    else if (b0 < 0xE0) ((b0 & 0x3F) << 16) | (streamByte(in) << 8) | streamByte(in)
    else if (b0 < 0xF0)
      ((b0 & 0x1F) << 24) | (streamByte(in) << 16) | (streamByte(in) << 8) | streamByte(in)
    else ((b0 & 0x0F) << 28) | (streamByte(in) << 20) | (streamByte(in) << 12) |
      (streamByte(in) << 4) | (streamByte(in) & 0x0F)
  }
  private def streamLtf8(in: InputStream): Long = {
    val b0 = streamByte(in)
    var n = 0
    while (n < 8 && (b0 & (0x80 >> n)) != 0) n += 1
    var v: Long = if (n < 8) (b0 & (0xFF >> (n + 1))).toLong else 0L
    var i = 0
    while (i < n) { v = (v << 8) | streamByte(in); i += 1 }
    v
  }

  /** Reads a container header from the stream; None at clean EOF.
    * CRAM 2.x stores the record counter as ITF8 (3.x: LTF8) and has no
    * trailing CRC32 (reference: cram/cram_io.c:3848-3870,3908). */
  private def readContainerHeader(in: InputStream, major: Int = 3): Option[ContainerHeader] = {
    val len0 = in.read()
    if (len0 < 0) return None
    if (major >= 4) {
      // 4.x: every field including the length is a varint; ref id is
      // zig-zag signed; positions are 64-bit (cram_io.c:3810-3846)
      def u7(first: Int): Long = {
        var v = (first & 0x7f).toLong; var c = first
        while ((c & 0x80) != 0) { c = streamByte(in); v = (v << 7) | (c & 0x7f) }
        v
      }
      val length = u7(len0).toInt
      val refIdRaw = u7(streamByte(in))
      val refId = ((refIdRaw >>> 1) ^ -(refIdRaw & 1L)).toInt
      val start = u7(streamByte(in)).toInt; val span = u7(streamByte(in)).toInt
      val nRec = u7(streamByte(in)).toInt
      val counter = u7(streamByte(in))
      u7(streamByte(in)) // bases
      val nBlocks = u7(streamByte(in)).toInt; val nLand = u7(streamByte(in)).toInt
      var i = 0
      while (i < nLand) { u7(streamByte(in)); i += 1 }
      in.skipNBytes(4) // crc32
      return Some(ContainerHeader(length, refId, start, span, nRec, counter, nBlocks))
    }
    val length = len0 | (streamByte(in) << 8) | (streamByte(in) << 16) | (streamByte(in) << 24)
    val refId = streamItf8(in); val start = streamItf8(in); val span = streamItf8(in)
    val nRec = streamItf8(in)
    val counter = if (major >= 3) streamLtf8(in) else streamItf8(in).toLong
    streamLtf8(in) // bases
    val nBlocks = streamItf8(in); val nLand = streamItf8(in)
    var i = 0
    while (i < nLand) { streamItf8(in); i += 1 }
    if (major >= 3) in.skipNBytes(4) // crc32
    val _ = span
    Some(ContainerHeader(length, refId, start, span, nRec, counter, nBlocks))
  }

  // ------------------------------------------------------------------
  // encodings
  // ------------------------------------------------------------------

  private final class DecodeCtx(val core: BitReader, val external: Map[Int, ByteReader])

  private sealed trait IntCodec { def decode(ctx: DecodeCtx): Int }
  private sealed trait ByteCodec { def decodeByte(ctx: DecodeCtx): Int }
  private sealed trait ArrCodec { def decodeArr(ctx: DecodeCtx): Array[Byte] }

  private final class ExternalInt(id: Int) extends IntCodec with ByteCodec {
    def decode(ctx: DecodeCtx): Int = ctx.external(id).itf8()
    def decodeByte(ctx: DecodeCtx): Int = ctx.external(id).u8()
    def bulk(ctx: DecodeCtx, n: Int): Array[Byte] = ctx.external(id).bytes(n)
  }
  /** CRAM 4.x VARINT codec: big-endian 7-bit varint from an external
    * block, optionally zig-zag signed, plus a stored offset
    * (reference: cram/cram_codecs.c:644-805). */
  private final class VarIntCodec(id: Int, offset: Long, signed: Boolean)
      extends IntCodec with ByteCodec {
    def decode(ctx: DecodeCtx): Int = decodeLong(ctx).toInt
    def decodeByte(ctx: DecodeCtx): Int = decodeLong(ctx).toInt
    def decodeLong(ctx: DecodeCtx): Long = {
      val r = ctx.external(id)
      var v = 0L; var c = 0
      while ({ c = r.u8(); v = (v << 7) | (c & 0x7f); (c & 0x80) != 0 }) ()
      (if (signed) (v >>> 1) ^ -(v & 1L) else v) + offset
    }
  }

  /** CRAM 4.x CONST codec: a fixed value, nothing read per record. */
  private final class ConstInt(value: Long) extends IntCodec with ByteCodec {
    def decode(ctx: DecodeCtx): Int = value.toInt
    def decodeByte(ctx: DecodeCtx): Int = value.toInt
  }

  private final class BetaInt(offset: Int, nBits: Int) extends IntCodec {
    def decode(ctx: DecodeCtx): Int = ctx.core.bits(nBits) - offset
  }
  private final class GammaInt(offset: Int) extends IntCodec {
    def decode(ctx: DecodeCtx): Int = {
      var nz = 0
      while (ctx.core.bit() == 0) nz += 1
      var v = 1
      var i = 0
      while (i < nz) { v = (v << 1) | ctx.core.bit(); i += 1 }
      v - offset
    }
  }

  /** Canonical Huffman: symbols sorted by (code length, symbol value),
    * codes assigned sequentially (reference: cram/cram_codecs.c:2896).
    * A single zero-length code reads no bits.
    */
  private final class HuffmanInt(symbols: Array[Int], lens: Array[Int])
      extends IntCodec with ByteCodec {
    private val sorted = symbols.zip(lens).sortBy { case (s, l) => (l, s) }
    private val codeMap: Map[(Int, Int), Int] = {
      var value = -1
      var lastLen = 0
      sorted.map { case (sym, len) =>
        value += 1
        if (len > lastLen) { value <<= (len - lastLen); lastLen = len }
        (len, value) -> sym
      }.toMap
    }
    private val constant = if (sorted.length == 1 && sorted.head._2 == 0) sorted.head._1 else Int.MinValue
    private val maxLen = if (lens.isEmpty) 0 else lens.max
    def decode(ctx: DecodeCtx): Int = {
      if (constant != Int.MinValue) return constant
      var len = 0
      var code = 0
      while (len <= maxLen) {
        code = (code << 1) | ctx.core.bit()
        len += 1
        codeMap.get((len, code)) match {
          case Some(sym) => return sym
          case None =>
        }
      }
      throw new CramException("invalid huffman code in core stream")
    }
    def decodeByte(ctx: DecodeCtx): Int = decode(ctx)
  }

  private final class ByteArrayStop(stop: Int, id: Int) extends ArrCodec {
    def decodeArr(ctx: DecodeCtx): Array[Byte] = {
      val r = ctx.external(id)
      val start = r.pos
      while (r.pos < r.buf.length && (r.buf(r.pos) & 0xFF) != stop) r.pos += 1
      val out = java.util.Arrays.copyOfRange(r.buf, start, r.pos)
      if (r.pos < r.buf.length) r.pos += 1 // consume stop byte
      out
    }
  }
  private final class ByteArrayLen(lenCodec: IntCodec, valCodec: ByteCodec) extends ArrCodec {
    def decodeArr(ctx: DecodeCtx): Array[Byte] = {
      val n = lenCodec.decode(ctx)
      valCodec match {
        case e: ExternalInt => // fast path: bulk read
          e.bulk(ctx, n)
        case other =>
          val out = new Array[Byte](n)
          var i = 0
          while (i < n) { out(i) = other.decodeByte(ctx).toByte; i += 1 }
          out
      }
    }
  }

  private def parseIntEncoding(encId: Int, params: Array[Byte], v4: Boolean = false): IntCodec = {
    val r = new ByteReader(params)
    encId match {
      case 1 => new ExternalInt(r.vi(v4))
      case 3 =>
        val n = r.vi(v4)
        val syms = Array.fill(n)(r.vi(v4))
        val nl = r.vi(v4)
        val lens = Array.fill(nl)(r.vi(v4))
        new HuffmanInt(syms, lens)
      case 6 => { val off = r.vi(v4); val bits = r.vi(v4); new BetaInt(off, bits) }
      case 9 => new GammaInt(r.vi(v4))
      case 41 => // VARINT_UNSIGNED (CRAM 4.x): content id + signed offset
        new VarIntCodec(r.u7(), r.u7ls(), signed = false)
      case 42 => // VARINT_SIGNED (CRAM 4.x): zig-zag payload
        new VarIntCodec(r.u7(), r.u7ls(), signed = true)
      case 43 | 44 => // CONST_BYTE / CONST_INT (CRAM 4.x): no stream reads
        new ConstInt(r.u7ls())
      case 0 => new IntCodec { def decode(ctx: DecodeCtx): Int = 0 } // NULL
      case other => throw new CramException(
        s"integer encoding $other is outside the supported subset " +
          "(EXTERNAL, HUFFMAN, BETA, GAMMA, VARINT, CONST)")
    }
  }

  private def parseByteCodec(encId: Int, params: Array[Byte], v4: Boolean = false): ByteCodec =
    parseIntEncoding(encId, params, v4) match {
      case b: ByteCodec => b
      case _ => throw new CramException(s"encoding $encId cannot produce bytes")
    }

  private def parseArrEncoding(encId: Int, params: Array[Byte], v4: Boolean = false): ArrCodec = {
    val r = new ByteReader(params)
    encId match {
      case 4 =>
        val lenEnc = r.vi(v4); val lenPLen = r.vi(v4); val lenParams = r.bytes(lenPLen)
        val valEnc = r.vi(v4); val valPLen = r.vi(v4); val valParams = r.bytes(valPLen)
        new ByteArrayLen(parseIntEncoding(lenEnc, lenParams, v4),
          parseByteCodec(valEnc, valParams, v4))
      case 5 =>
        val stop = r.u8(); val id = r.vi(v4)
        new ByteArrayStop(stop, id)
      case other => throw new CramException(
        s"byte-array encoding $other is outside the supported subset " +
          "(BYTE_ARRAY_LEN, BYTE_ARRAY_STOP)")
    }
  }

  // ------------------------------------------------------------------
  // compression header
  // ------------------------------------------------------------------

  private final case class CompHeader(
      rnPreserved: Boolean, apDelta: Boolean, refRequired: Boolean,
      qsSeqOrient: Boolean, // QO=1 (default): quals already in SEQ orientation
      subMatrix: Array[Array[Char]], // [refBaseIdx][code] -> substituted base
      tdLines: Array[Array[Int]], // tag keys ((c1<<16)|(c2<<8)|type) per line
      ds: Map[String, IntCodec],
      dsArr: Map[String, ArrCodec],
      tags: Map[Int, ArrCodec])

  private final val RefBases = "ACGTN"

  private def parseCompHeader(data: Array[Byte], major: Int = 3): CompHeader = {
    val r = new ByteReader(data)
    val v4 = major >= 4
    var rn = true; var ap = true; var rr = true; var qo = true
    var sm: Array[Array[Char]] = {
      // identity-free default: code order CGTN/AGTN/ACTN/ACGN/ACGT
      val defaults = Array("CGTN", "AGTN", "ACTN", "ACGN", "ACGT")
      defaults.map(_.toCharArray)
    }
    var tdLines: Array[Array[Int]] = Array(Array.empty[Int])
    // preservation map
    r.vi(v4) // size in bytes
    val nPres = r.vi(v4)
    var i = 0
    while (i < nPres) {
      val key = new String(r.bytes(2), "US-ASCII")
      key match {
        case "RN" => rn = r.u8() != 0
        case "AP" => ap = r.u8() != 0
        case "RR" => rr = r.u8() != 0
        case "QO" => qo = r.u8() != 0 // CRAM 4.x quality orientation
        case "SM" =>
          val m = Array.ofDim[Char](5, 4)
          var b = 0
          while (b < 5) {
            val v = r.u8()
            val alts = RefBases.filterNot(_ == RefBases(b))
            m(b)((v >> 6) & 3) = alts(0)
            m(b)((v >> 4) & 3) = alts(1)
            m(b)((v >> 2) & 3) = alts(2)
            m(b)(v & 3) = alts(3)
            b += 1
          }
          sm = m
        case "TD" =>
          val len = r.vi(v4)
          val td = r.bytes(len)
          val lines = mutable.ArrayBuffer.empty[Array[Int]]
          val cur = mutable.ArrayBuffer.empty[Int]
          var p = 0
          while (p < td.length) {
            if (td(p) == 0) { lines += cur.toArray; cur.clear() }
            else {
              cur += (((td(p) & 0xFF) << 16) | ((td(p + 1) & 0xFF) << 8) | (td(p + 2) & 0xFF))
              p += 2
            }
            p += 1
          }
          tdLines = lines.toArray
          if (tdLines.isEmpty) tdLines = Array(Array.empty[Int])
        case other => throw new CramException(s"unknown preservation key $other")
      }
      i += 1
    }
    // data series encodings
    r.vi(v4)
    val nDs = r.vi(v4)
    val ds = mutable.Map.empty[String, IntCodec]
    val dsArr = mutable.Map.empty[String, ArrCodec]
    val arrSeries = Set("RN", "IN", "SC", "BB", "QQ")
    i = 0
    while (i < nDs) {
      val key = new String(r.bytes(2), "US-ASCII")
      val enc = r.vi(v4)
      val plen = r.vi(v4)
      val params = r.bytes(plen)
      if (arrSeries(key)) dsArr(key) = parseArrEncoding(enc, params, v4)
      else ds(key) = parseIntEncoding(enc, params, v4)
      i += 1
    }
    // tag encodings
    r.vi(v4)
    val nTags = r.vi(v4)
    val tags = mutable.Map.empty[Int, ArrCodec]
    i = 0
    while (i < nTags) {
      val key = r.vi(v4)
      val enc = r.vi(v4)
      val plen = r.vi(v4)
      val params = r.bytes(plen)
      tags(key) = parseArrEncoding(enc, params, v4)
      i += 1
    }
    CompHeader(rn, ap, rr, qo, sm, tdLines, ds.toMap, dsArr.toMap, tags.toMap)
  }

  // ------------------------------------------------------------------
  // slice header
  // ------------------------------------------------------------------

  private final case class SliceHeader(refId: Int, start: Int, span: Int,
      nRecords: Int, counter: Long, nBlocks: Int, blockIds: Array[Int],
      embRefId: Int)

  private def parseSliceHeader(data: Array[Byte], major: Int = 3): SliceHeader = {
    val r = new ByteReader(data)
    val v4 = major >= 4
    val refId = if (v4) r.u7s() else r.itf8()
    val start = if (v4) r.u7l().toInt else r.itf8()
    val span = if (v4) r.u7l().toInt else r.itf8()
    val nRec = r.vi(v4)
    val counter = if (v4) r.u7l() else if (major >= 3) r.ltf8() else r.itf8().toLong
    val nBlocks = r.vi(v4)
    val nIds = r.vi(v4)
    val ids = Array.fill(nIds)(r.vi(v4))
    val emb = r.vi(v4)
    SliceHeader(refId, start, span, nRec, counter, nBlocks, ids, emb)
  }

  // ------------------------------------------------------------------
  // reference FASTA
  // ------------------------------------------------------------------

  /** Plain (optionally gzipped) FASTA → name → upper-case base array. */
  /** Process-wide reference cache: at cluster scale an executor runs
    * many CRAM tasks against the same FASTA (a mammalian genome is
    * ~3 GB parsed) — re-reading it per task would dominate decode and
    * multiply memory. Soft references let the JVM reclaim entries
    * under pressure; keyed by path, matching htslib's per-process
    * REF_CACHE behaviour.
    */
  private val fastaCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.ref.SoftReference[Map[String, Array[Byte]]]]
  // Single-flight guard (r11 verdict #2): N concurrent COLD tasks on an
  // executor must not each parse the same ~3 GB genome — exactly the
  // transient-heap blow-up the cache exists to prevent. The first
  // caller per path installs a FutureTask; concurrent losers block on
  // it instead of re-parsing. The winner removes its entry after
  // completion (value already in fastaCache), so a later SoftReference
  // eviction can be re-loaded.
  private val fastaInflight =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.FutureTask[Map[String, Array[Byte]]]]
  private[graft] val fastaLoads = new java.util.concurrent.atomic.AtomicLong // spec hook

  def loadFastaCached(path: String, open: String => InputStream): Map[String, Array[Byte]] = {
    val cached = Option(fastaCache.get(path)).flatMap(r => Option(r.get))
    cached.getOrElse {
      val task = new java.util.concurrent.FutureTask(
        new java.util.concurrent.Callable[Map[String, Array[Byte]]] {
          def call(): Map[String, Array[Byte]] = {
            val loaded = loadFasta(open(path))
            fastaCache.put(path, new java.lang.ref.SoftReference(loaded))
            loaded
          }
        })
      val prior = fastaInflight.putIfAbsent(path, task)
      val winner = prior == null
      val run = if (winner) { task.run(); task } else prior
      try run.get()
      catch {
        case e: java.util.concurrent.ExecutionException =>
          throw Option(e.getCause).getOrElse(e)
      } finally if (winner) fastaInflight.remove(path, task)
    }
  }

  def loadFasta(stream: InputStream): Map[String, Array[Byte]] = {
    fastaLoads.incrementAndGet()
    val src = scala.io.Source.fromInputStream(stream, "US-ASCII")
    val out = mutable.Map.empty[String, Array[Byte]]
    var name: String = null
    val sb = new java.io.ByteArrayOutputStream()
    try {
      for (line <- src.getLines()) {
        if (line.startsWith(">")) {
          if (name != null) out(name) = sb.toByteArray
          name = line.substring(1).takeWhile(!_.isWhitespace)
          sb.reset()
        } else sb.write(line.trim.toUpperCase.getBytes("US-ASCII"))
      }
      if (name != null) out(name) = sb.toByteArray
    } finally src.close()
    out.toMap
  }

  // ------------------------------------------------------------------
  // record decoding
  // ------------------------------------------------------------------

  private final class CramRec {
    var bf = 0; var cf = 0; var refId = -1; var readLen = 0; var apos = 0
    var name: String = ""
    var mateFlags = 0; var mateRefId = -1; var matePos = 0; var tlen = 0L
    var tlenSet = false
    var mateLine = -1 // in-slice mate index
    var mapq = 0
    var cigar = "*"
    var seq: String = null
    var quals: Array[Byte] = null
    var aend = 0
    var tagsText: List[String] = Nil
    var forceMd: Boolean = false // CRAM 4.x MD*/NM* placeholder present
  }

  /** Iterator of SAM text lines over one CRAM file. */
  final class Reader(
      in: InputStream,
      referenceFasta: => Option[Map[String, Array[Byte]]],
      path: String,
      generateMd: Boolean = true) extends Iterator[String] {

    private var majorVers: Int = 3 // set from the file magic before any container read

    private val refNames: Array[String] = {
      val magic = new Array[Byte](4)
      if (in.readNBytes(magic, 0, 4) != 4 || !magic.sameElements("CRAM".getBytes("US-ASCII")))
        throw new CramException(s"not a CRAM file: $path")
      val major = in.read(); val minor = in.read()
      if (major < 2 || major > 4)
        throw new CramException(
          s"CRAM version $major.$minor is outside the supported subset (2.x-4.x): $path")
      majorVers = major
      in.skipNBytes(20) // file id
      // first container: SAM header text
      val hdr = readContainerHeader(in, majorVers).getOrElse(throw new CramException("empty CRAM"))
      val payload = new Array[Byte](hdr.length)
      if (in.readNBytes(payload, 0, hdr.length) != hdr.length)
        throw new CramException("truncated header container")
      val block = readBlock(new ByteReader(payload), majorVers)
      // block content: int32 text length + SAM text
      val br = new ByteReader(block.data)
      val textLen = br.i32le()
      val text = new String(br.bytes(math.min(textLen, br.remaining)), "US-ASCII")
      text.linesIterator.filter(_.startsWith("@SQ")).map { line =>
        line.split("\t").find(_.startsWith("SN:")).map(_.substring(3))
          .getOrElse(throw new CramException("@SQ without SN"))
      }.toArray
    }

    private lazy val reference: Map[String, Array[Byte]] = referenceFasta.getOrElse(
      throw new CramException(
        "this CRAM requires the reference FASTA for sequence reconstruction; " +
          s"pass .option(\"reference_fasta\", \"/path/ref.fa\") when reading $path"))

    private var queue: Iterator[String] = Iterator.empty

    private def refName(id: Int): String =
      if (id < 0) "*"
      else if (id < refNames.length) refNames(id)
      else throw new CramException(s"reference id $id out of range")

    def hasNext: Boolean = {
      while (!queue.hasNext && advance()) {}
      queue.hasNext
    }
    def next(): String = { if (!hasNext) throw new NoSuchElementException; queue.next() }

    /** Reads the next data container; false at EOF. */
    private def advance(): Boolean = {
      readContainerHeader(in, majorVers) match {
        case None => false
        case Some(ch) =>
          val payload = new Array[Byte](ch.length)
          if (in.readNBytes(payload, 0, ch.length) != ch.length)
            throw new CramException("truncated container")
          if (ch.nRecords == 0) {
            // EOF marker container (or an empty one) — keep scanning
            advance()
          } else {
            queue = decodeContainer(payload, ch)
            true
          }
      }
    }

    private def decodeContainer(payload: Array[Byte], ch: ContainerHeader): Iterator[String] = {
      val r = new ByteReader(payload)
      val first = readBlock(r, majorVers)
      if (first.contentType != 1)
        throw new CramException("container does not start with a compression header")
      val hdr = parseCompHeader(first.data, majorVers)
      val lines = mutable.ArrayBuffer.empty[String]
      while (r.remaining > 0) {
        val sliceHdrBlock = readBlock(r, majorVers)
        if (sliceHdrBlock.contentType != 2)
          throw new CramException(s"expected slice header, got type ${sliceHdrBlock.contentType}")
        val sh = parseSliceHeader(sliceHdrBlock.data, majorVers)
        var core: BitReader = null
        val ext = mutable.Map.empty[Int, ByteReader]
        var embRef: Array[Byte] = null
        var bi = 0
        while (bi < sh.nBlocks) {
          val b = readBlock(r, majorVers)
          if (b.contentType == 5) core = new BitReader(b.data)
          else {
            if (b.contentId == sh.embRefId) embRef = b.data
            ext(b.contentId) = new ByteReader(b.data)
          }
          bi += 1
        }
        embRefForRec = embRef
        embRefStart = sh.start
        lines ++= decodeSlice(hdr, sh, new DecodeCtx(core, ext.toMap))
        embRefForRec = null
      }
      lines.iterator
    }

    /** Data-series codecs resolved once per slice — the string-keyed
      * map lookups were per-record/per-feature before (tens of
      * millions of hash probes on a multi-million-read file). */
    private final class SliceCodecs(hdr: CompHeader) {
      lazy val FN = intDs(hdr, "FN"); lazy val FC = intDs(hdr, "FC")
      lazy val FP = intDs(hdr, "FP"); lazy val MQ = intDs(hdr, "MQ")
      lazy val BS = intDs(hdr, "BS"); lazy val DL = intDs(hdr, "DL")
      lazy val RS = intDs(hdr, "RS"); lazy val HC = intDs(hdr, "HC")
      lazy val PD = intDs(hdr, "PD")
      lazy val BA = byteDs(hdr, "BA"); lazy val QS = byteDs(hdr, "QS")
      lazy val IN = arrDs(hdr, "IN"); lazy val BB = arrDs(hdr, "BB")
      lazy val QQ = arrDs(hdr, "QQ"); lazy val SC = arrDs(hdr, "SC")
    }

    private def intDs(hdr: CompHeader, key: String): IntCodec =
      hdr.ds.getOrElse(key, throw new CramException(s"data series $key not declared"))
    private def arrDs(hdr: CompHeader, key: String): ArrCodec =
      hdr.dsArr.getOrElse(key, throw new CramException(s"byte series $key not declared"))
    /** QS/BA are byte-type series (CRAM 3.0 §8.4): EXTERNAL payloads are
      * raw bytes, NOT ITF8 — a 0xff quality (htslib's missing-qual
      * filler) would otherwise parse as a 5-byte integer. */
    private def byteDs(hdr: CompHeader, key: String): ByteCodec =
      intDs(hdr, key) match {
        case b: ByteCodec => b
        case other => new ByteCodec { def decodeByte(ctx: DecodeCtx): Int = other.decode(ctx) }
      }

    private def decodeSlice(hdr: CompHeader, sh: SliceHeader, ctx: DecodeCtx): Seq[String] = {
      val n = sh.nRecords
      val dsc = new SliceCodecs(hdr)
      val recs = new Array[CramRec](n)
      val BF = intDs(hdr, "BF"); val CF = intDs(hdr, "CF")
      val RL = intDs(hdr, "RL"); val AP = intDs(hdr, "AP")
      val RG = intDs(hdr, "RG"); val TL = intDs(hdr, "TL")
      val RI = if (sh.refId == -2) Some(intDs(hdr, "RI")) else None
      var lastApos = sh.start
      var i = 0
      while (i < n) {
        val rec = new CramRec
        rec.bf = BF.decode(ctx)
        rec.cf = CF.decode(ctx)
        rec.refId = RI.map(_.decode(ctx)).getOrElse(sh.refId)
        rec.readLen = RL.decode(ctx)
        rec.apos = if (hdr.apDelta) { lastApos += AP.decode(ctx); lastApos } else AP.decode(ctx)
        RG.decode(ctx) // read group index — not part of the 21-col surface
        rec.name =
          if (hdr.rnPreserved) new String(arrDs(hdr, "RN").decodeArr(ctx), "US-ASCII")
          else s"$path/${sh.counter + i}"
        if ((rec.cf & 0x2) != 0) { // detached
          rec.mateFlags = intDs(hdr, "MF").decode(ctx)
          if (!hdr.rnPreserved)
            rec.name = new String(arrDs(hdr, "RN").decodeArr(ctx), "US-ASCII")
          rec.mateRefId = intDs(hdr, "NS").decode(ctx)
          rec.matePos = intDs(hdr, "NP").decode(ctx)
          // TS is 64-bit in CRAM 4.x; take the full varint when the
          // codec carries one (positions keep the 32-bit subset — BAM
          // itself caps there; documented in the class scaladoc)
          rec.tlen = intDs(hdr, "TS") match {
            case v: VarIntCodec => v.decodeLong(ctx)
            case c => c.decode(ctx).toLong
          }
          rec.tlenSet = true
          // restore mate-derived flags stripped at encode time
          if ((rec.mateFlags & 0x1) != 0) rec.bf |= 0x1 | 0x20
          if ((rec.mateFlags & 0x2) != 0) rec.bf |= 0x8
          if ((rec.bf & 0x1) == 0) rec.mateRefId = -1
        } else if ((rec.cf & 0x4) != 0) {
          rec.mateLine = i + intDs(hdr, "NF").decode(ctx) + 1
        }
        val tl = TL.decode(ctx)
        if (tl < 0 || tl >= hdr.tdLines.length)
          throw new CramException(s"TL $tl outside the tag dictionary")
        rec.tagsText = hdr.tdLines(tl).toList.flatMap { key =>
          if ((key & 0xFF) == '*') {
            // CRAM 4.x auto-generated placeholder (MD*/NM*/RG*): nothing
            // stored per record; MD/NM are regenerated from the
            // reference, RG is outside the 21-col tag subset
            // (reference: cram/cram_decode.c:2000-2031)
            val name = (key >> 8) & 0xFFFF
            if (name == (('M' << 8) | 'D') || name == (('N' << 8) | 'M'))
              rec.forceMd = true
            None
          } else {
            val bytes = hdr.tags.getOrElse(key,
              throw new CramException(f"tag 0x$key%06x has no encoding")).decodeArr(ctx)
            Some(tagToText(key, bytes))
          }
        }
        if ((rec.bf & 0x4) == 0) decodeMapped(hdr, dsc, ctx, rec)
        else decodeUnmapped(dsc, ctx, rec)
        if (!hdr.qsSeqOrient && (rec.bf & 0x10) != 0 && rec.quals != null) {
          // QO=0: stored original orientation; flip to SEQ orientation
          val q = rec.quals
          var a = 0; var b = q.length - 1
          while (a < b) { val t = q(a); q(a) = q(b); q(b) = t; a += 1; b -= 1 }
        }
        rec.aend =
          if ((rec.bf & 0x4) != 0 || rec.cigar == "*") rec.apos
          else rec.apos + SamCodec.cigarRefLen(rec.cigar).toInt - 1
        recs(i) = rec
        i += 1
      }
      resolveMates(recs)
      recs.map(toSamLine).toSeq
    }

    /** Feature-based decode: bases+cigar reconstructed against the
      * reference (or embedded reference) slice.
      */
    private def decodeMapped(hdr: CompHeader, dsc: SliceCodecs, ctx: DecodeCtx,
        rec: CramRec): Unit = {
      val fn = dsc.FN.decode(ctx)
      val rl = rec.readLen
      val seq = new Array[Byte](rl)
      val quals = new Array[Byte](rl)
      java.util.Arrays.fill(quals, 0xFF.toByte)
      val noSeq = (rec.cf & 0x8) != 0
      val cigar = new StringBuilder
      var cigOp = ' '
      var cigLen = 0
      def emit(op: Char, len: Int): Unit = if (len > 0) {
        if (op == cigOp) cigLen += len
        else {
          if (cigLen > 0) { cigar.append(cigLen); cigar.append(cigOp) }
          cigOp = op; cigLen = len
        }
      }
      lazy val refBases: Array[Byte] = {
        val nm = refName(rec.refId)
        reference.getOrElse(nm, throw new CramException(s"reference sequence $nm not in FASTA"))
      }
      // 0-based read cursor and 1-based reference cursor
      var rp = 0
      var ref = rec.apos
      def refBase(pos1: Int): Byte = {
        if (embRefForRec != null) {
          val off = pos1 - embRefStart
          if (off < 0 || off >= embRefForRec.length) 'N'.toByte else embRefForRec(off)
        } else {
          if (pos1 < 1 || pos1 > refBases.length) 'N'.toByte else refBases(pos1 - 1)
        }
      }
      def copyRef(until: Int): Unit = { // fill read positions [rp, until)
        val len = until - rp
        if (len > 0) {
          if (!noSeq) {
            var k = 0
            while (k < len) { seq(rp + k) = refBase(ref + k); k += 1 }
          }
          rp += len; ref += len
          emit('M', len)
        }
      }
      var prevPos = 0
      var f = 0
      while (f < fn) {
        val code = dsc.FC.decode(ctx).toChar
        val pos = prevPos + dsc.FP.decode(ctx)
        prevPos = pos
        copyRef(pos - 1)
        code match {
          case 'B' =>
            val base = dsc.BA.decodeByte(ctx)
            val q = dsc.QS.decodeByte(ctx)
            if (!noSeq) seq(rp) = base.toByte
            quals(rp) = q.toByte
            rp += 1; ref += 1; emit('M', 1)
          case 'X' =>
            val code2 = dsc.BS.decode(ctx)
            if (!noSeq) {
              val rb = refBase(ref)
              val idx = RefBases.indexOf(rb.toChar.toUpper) match { case -1 => 4; case x => x }
              seq(rp) = hdr.subMatrix(idx)(code2).toByte
            }
            rp += 1; ref += 1; emit('M', 1)
          case 'I' =>
            val ins = dsc.IN.decodeArr(ctx)
            if (!noSeq) System.arraycopy(ins, 0, seq, rp, ins.length)
            rp += ins.length; emit('I', ins.length)
          case 'i' =>
            val base = dsc.BA.decodeByte(ctx)
            if (!noSeq) seq(rp) = base.toByte
            rp += 1; emit('I', 1)
          case 'b' =>
            val bases = dsc.BB.decodeArr(ctx)
            if (!noSeq) System.arraycopy(bases, 0, seq, rp, bases.length)
            rp += bases.length; ref += bases.length; emit('M', bases.length)
          case 'q' =>
            val qs = dsc.QQ.decodeArr(ctx)
            System.arraycopy(qs, 0, quals, rp, qs.length)
          case 'Q' =>
            quals(rp) = dsc.QS.decodeByte(ctx).toByte
          case 'S' =>
            val clip = dsc.SC.decodeArr(ctx)
            if (!noSeq) System.arraycopy(clip, 0, seq, rp, clip.length)
            rp += clip.length; emit('S', clip.length)
          case 'D' =>
            val len = dsc.DL.decode(ctx)
            ref += len; emit('D', len)
          case 'N' =>
            val len = dsc.RS.decode(ctx)
            ref += len; emit('N', len)
          case 'H' =>
            val len = dsc.HC.decode(ctx)
            emit('H', len)
          case 'P' =>
            val len = dsc.PD.decode(ctx)
            emit('P', len)
          case other => throw new CramException(s"read feature '$other' not supported")
        }
        f += 1
      }
      copyRef(rl)
      if (cigLen > 0) { cigar.append(cigLen); cigar.append(cigOp) }
      rec.mapq = dsc.MQ.decode(ctx)
      if ((rec.cf & 0x1) != 0) {
        var k = 0
        while (k < rl) { quals(k) = dsc.QS.decodeByte(ctx).toByte; k += 1 }
      }
      rec.cigar = if (cigar.isEmpty) s"${rl}M" else cigar.toString
      rec.seq = if (noSeq) null else new String(seq, "US-ASCII")
      rec.quals = if (allFF(quals)) null else quals
      if (!noSeq) genMdNm(rec, refBase)
    }

    /** MD/NM are not stored in CRAM — they are regenerated from the
      * reference at decode time, as htslib does (samtools-calmd
      * semantics: NM = mismatches + inserted + deleted bases; MD =
      * match-run counts, mismatch ref bases, '^'-prefixed deletions).
      * Stored MD/NM tags, when present, win; `generateMd=false`
      * (htslib's `nomd` option) disables the synthesis.
      */
    private def genMdNm(rec: CramRec, refBase: Int => Byte): Unit = {
      if (!generateMd && !rec.forceMd) return
      if (rec.tagsText.exists(t => t.startsWith("MD:") || t.startsWith("NM:"))) return
      val seq = rec.seq
      var nm = 0L
      val md = new StringBuilder
      var matchRun = 0
      var rp = 0
      var ref = rec.apos
      var num = 0
      for (c <- rec.cigar) {
        if (c.isDigit) num = num * 10 + (c - '0')
        else {
          c match {
            case 'M' | '=' | 'X' =>
              var k = 0
              while (k < num) {
                val rb = Character.toUpperCase(refBase(ref + k).toChar)
                val qb = Character.toUpperCase(seq.charAt(rp + k))
                if (qb == rb) matchRun += 1
                else { md.append(matchRun).append(rb); matchRun = 0; nm += 1 }
                k += 1
              }
              rp += num; ref += num
            case 'I' => nm += num; rp += num
            case 'S' => rp += num
            case 'D' =>
              md.append(matchRun).append('^'); matchRun = 0
              var k = 0
              while (k < num) {
                md.append(Character.toUpperCase(refBase(ref + k).toChar)); k += 1
              }
              nm += num; ref += num
            case 'N' => ref += num
            case _ => // H, P: no read or reference bases
          }
          num = 0
        }
      }
      md.append(matchRun)
      rec.tagsText = rec.tagsText :+ s"MD:Z:${md.toString}" :+ s"NM:i:$nm"
    }

    // embedded-reference state for the slice being decoded
    private var embRefForRec: Array[Byte] = null
    private var embRefStart = 0

    private def decodeUnmapped(dsc: SliceCodecs, ctx: DecodeCtx, rec: CramRec): Unit = {
      val rl = rec.readLen
      val noSeq = (rec.cf & 0x8) != 0
      if (!noSeq) {
        val seq = new Array[Byte](rl)
        var k = 0
        while (k < rl) { seq(k) = dsc.BA.decodeByte(ctx).toByte; k += 1 }
        rec.seq = new String(seq, "US-ASCII")
      }
      if ((rec.cf & 0x1) != 0) {
        val quals = new Array[Byte](rl)
        var k = 0
        while (k < rl) { quals(k) = dsc.QS.decodeByte(ctx).toByte; k += 1 }
        rec.quals = quals
      }
      rec.cigar = "*"
      rec.mapq = 0
    }

    private def allFF(a: Array[Byte]): Boolean = {
      var i = 0
      while (i < a.length) { if (a(i) != -1) return false; i += 1 }
      true
    }

    /** In-slice mate chains: positions/refs/flags/TLEN
      * (reference: cram/cram_decode.c:2077-2232 semantics).
      */
    private def resolveMates(recs: Array[CramRec]): Unit = {
      val n = recs.length
      var i = 0
      while (i < n) {
        val r = recs(i)
        if (r.mateLine >= 0 && !r.tlenSet) {
          if (r.mateLine >= n) throw new CramException("mate line out of slice")
          // walk the chain, closing it at the last record
          var aleft = r.apos.toLong; var aright = r.aend.toLong
          var leftCnt = 0
          var sameRef = true
          var id = i
          val chain = mutable.ArrayBuffer.empty[Int]
          var closed = false
          while (!closed) {
            chain += id
            val c = recs(id)
            if (c.apos < aleft) { aleft = c.apos; leftCnt = 1 }
            else if (c.apos == aleft) leftCnt += 1
            if (c.aend > aright) aright = c.aend
            if (c.refId != r.refId) sameRef = false
            if (c.mateLine == -1) { c.mateLine = i; closed = true }
            else if (c.mateLine == i) closed = true
            else id = c.mateLine
          }
          val tlen = aright - aleft + 1
          for (idx <- chain) {
            val c = recs(idx)
            if (!sameRef) { c.tlen = 0; c.tlenSet = true }
            else {
              if (c.apos == aleft && (leftCnt == 1 || (c.bf & 0x40) != 0)) c.tlen = tlen
              else c.tlen = -tlen
              c.tlenSet = true
            }
          }
        }
        i += 1
      }
      // second pass: mate pos/ref/flags from the resolved chain
      i = 0
      while (i < n) {
        val r = recs(i)
        if (r.mateLine >= 0 && r.mateLine < n && (r.cf & 0x2) == 0) {
          val m = recs(r.mateLine)
          r.matePos = m.apos
          r.mateRefId = m.refId
          r.bf |= 0x1
          if ((m.bf & 0x4) != 0) { r.bf |= 0x8; r.tlen = 0 }
          if ((r.bf & 0x4) != 0) r.tlen = 0
          if ((m.bf & 0x10) != 0) r.bf |= 0x20
        }
        i += 1
      }
    }

    /** BAM-typed tag bytes → SAM text field. */
    private def tagToText(key: Int, bytes: Array[Byte]): String = {
      val name = "" + ((key >> 16) & 0xFF).toChar + ((key >> 8) & 0xFF).toChar
      val typ = (key & 0xFF).toChar
      val r = new ByteReader(bytes)
      def i16(): Int = { val v = (r.u8() | (r.u8() << 8)).toShort.toInt; v }
      def u16(): Int = r.u8() | (r.u8() << 8)
      def i32(): Int = r.i32le()
      typ match {
        case 'A' => s"$name:A:${r.u8().toChar}"
        case 'c' => s"$name:i:${bytes(0).toInt}"
        case 'C' => s"$name:i:${r.u8()}"
        case 's' => s"$name:i:${i16()}"
        case 'S' => s"$name:i:${u16()}"
        case 'i' => s"$name:i:${i32()}"
        case 'I' => s"$name:i:${i32().toLong & 0xFFFFFFFFL}"
        case 'f' =>
          val f = java.lang.Float.intBitsToFloat(i32())
          val s = if (f == f.toLong.toFloat) f.toLong.toString else f.toString
          s"$name:f:$s"
        case 'Z' =>
          val end = if (bytes.nonEmpty && bytes(bytes.length - 1) == 0) bytes.length - 1 else bytes.length
          s"$name:Z:${new String(bytes, 0, end, "US-ASCII")}"
        case 'H' =>
          val end = if (bytes.nonEmpty && bytes(bytes.length - 1) == 0) bytes.length - 1 else bytes.length
          s"$name:H:${new String(bytes, 0, end, "US-ASCII")}"
        case 'B' =>
          val sub = r.u8().toChar
          val cnt = r.i32le()
          val sb = new StringBuilder(s"$name:B:$sub")
          var k = 0
          while (k < cnt) {
            sb.append(',')
            sub match {
              case 'c' => sb.append(r.u8().toByte.toInt)
              case 'C' => sb.append(r.u8())
              case 's' => sb.append(i16())
              case 'S' => sb.append(u16())
              case 'i' => sb.append(i32())
              case 'I' => sb.append(i32().toLong & 0xFFFFFFFFL)
              case 'f' =>
                val f = java.lang.Float.intBitsToFloat(i32())
                sb.append(if (f == f.toLong.toFloat) f.toLong.toString else f.toString)
              case other => throw new CramException(s"B-array subtype '$other'")
            }
            k += 1
          }
          sb.toString
        case other => throw new CramException(s"tag type '$other' not supported")
      }
    }

    private def toSamLine(rec: CramRec): String = {
      val sb = new StringBuilder(128)
      sb.append(rec.name).append('\t')
      sb.append(rec.bf).append('\t')
      sb.append(refName(rec.refId)).append('\t')
      sb.append(if (rec.refId < 0 && rec.apos <= 0) 0 else rec.apos).append('\t')
      sb.append(rec.mapq).append('\t')
      sb.append(rec.cigar).append('\t')
      sb.append(refName(rec.mateRefId)).append('\t')
      sb.append(rec.matePos).append('\t')
      sb.append(rec.tlen).append('\t')
      sb.append(if (rec.seq == null) "*" else rec.seq).append('\t')
      if (rec.quals == null) sb.append('*')
      else {
        var k = 0
        while (k < rec.quals.length) {
          sb.append((math.min(rec.quals(k) & 0xFF, 93) + 33).toChar); k += 1
        }
      }
      for (t <- rec.tagsText) sb.append('\t').append(t)
      sb.toString
    }
  }
}
