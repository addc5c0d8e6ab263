package graft.kernel

/** Adaptive arithmetic (range-coder) stream decoder — the htscodecs
  * "arith dynamic" format used by CRAM 3.1 block compression method 6
  * and, internally, by the tok3 read-name codec when its `use_arith`
  * flag is set ([[NameTok3]]).
  *
  * Written from the public CRAM 3.1 codecs specification; container
  * flag semantics, the Shelwien carry-aware range coder and the
  * adaptive symbol model's exact adaptation schedule (STEP=16,
  * MAX_FREQ=(1<<16)-17, halving normalisation, approximate-sort swap)
  * cross-checked against the reference's vendored htscodecs
  * (reference: ext/htslib-1.22.1/htscodecs/htscodecs/arith_dynamic.c:
  * 1032-1277, c_range_coder.h, c_simple_model.h) and validated
  * bit-for-bit against its committed golden vectors
  * (htscodecs/tests/dat/arith/q4.*).
  *
  * The container layout mirrors rANSNx16 ([[RansNx16]]): a flag byte
  * (order 0/1, X_EXT=4 external bz2, X_STRIPE=8, X_NOSZ=16, X_CAT=32,
  * X_RLE=64, X_PACK=128), a uint7 uncompressed size unless NOSZ, then
  * optional pack metadata and the entropy-coded payload. Unlike
  * rANSNx16, RLE here is decoded inline by the same adaptive coder
  * (literal model + per-context run models), not via a separate run
  * metadata stream.
  *
  * Scale note: decode is strictly sequential per stream (adaptive
  * model), O(n) time and O(1) model state; parallelism comes from
  * Spark's one-task-per-file/container planning, never from inside a
  * stream.
  */
object ArithDynamic {

  final class ArithException(msg: String) extends IllegalArgumentException(msg)

  private final val TOP = 1 << 24
  private[kernel] final val MAX_FREQ = (1 << 16) - 17
  private final val STEP = 16

  // ------------------------------------------------------------------
  // range decoder (shared with the fqzcomp quality codec)
  // ------------------------------------------------------------------

  private[kernel] final class RangeDecoder(in: Array[Byte], var p: Int, end: Int) {
    var code: Int = 0
    var range: Int = -1 // 0xFFFFFFFF unsigned

    if (p + 5 > end) { p = end } // prevent decode on truncated input
    else {
      var i = 0
      while (i < 5) { code = (code << 8) | (in(p) & 0xff); p += 1; i += 1 }
    }

    /** Divides range by totFreq and returns the cumulative-frequency
      * slot; 0 (without dividing) on degenerate range, matching the
      * reference's corrupt-input behaviour. */
    def getFreq(totFreq: Int): Int =
      if (totFreq != 0 && Integer.compareUnsigned(range, totFreq) >= 0) {
        range = Integer.divideUnsigned(range, totFreq)
        Integer.divideUnsigned(code, range)
      } else 0

    /** Narrows to [cumFreq, cumFreq+freq) and renormalises. */
    def decode(cumFreq: Int, freq: Int): Unit = {
      code -= cumFreq * range
      range *= freq
      while (Integer.compareUnsigned(range, TOP) < 0) {
        if (p >= end)
          throw new ArithException("arith: range coder ran off the input")
        code = (code << 8) | (in(p) & 0xff); p += 1
        range <<= 8
      }
    }
  }

  // ------------------------------------------------------------------
  // adaptive symbol model (frequency-sorted linear scan)
  // ------------------------------------------------------------------

  /** `nsym`-slot adaptive model over symbols 0..maxSym-1. Index 0 is a
    * MAX_FREQ sentinel so the keep-sorted swap never crosses the
    * array head; a zero-freq terminal bounds the scan. Frequencies are
    * 16-bit (Char) — a symbol peaks at MAX_FREQ+STEP = 65535 before
    * normalisation halves it — which keeps the 65k-context fqzcomp
    * model array compact. */
  private[kernel] final class SimpleModel(nsym: Int, maxSym: Int) {
    private val freq = new Array[Char](nsym + 2)
    private val sym = new Array[Char](nsym + 2)
    private var tot = maxSym

    freq(0) = MAX_FREQ.toChar
    private var i0 = 0
    while (i0 < maxSym) { sym(i0 + 1) = i0.toChar; freq(i0 + 1) = 1; i0 += 1 }
    while (i0 < nsym) { sym(i0 + 1) = i0.toChar; i0 += 1 }

    private def normalize(): Unit = {
      tot = 0
      var i = 1
      while (i <= nsym && freq(i) != 0) {
        freq(i) = (freq(i) - (freq(i) >> 1)).toChar
        tot += freq(i)
        i += 1
      }
    }

    def decodeSymbol(rc: RangeDecoder): Int = {
      val f = rc.getFreq(tot)
      if (f > MAX_FREQ) throw new ArithException("arith: frequency out of range")
      var acc = 0
      var i = 1
      while ({ acc += freq(i); acc <= f }) {
        i += 1
        if (i > nsym + 1) throw new ArithException("arith: symbol scan overran model")
      }
      if (i > nsym + 1) throw new ArithException("arith: symbol scan overran model")
      acc -= freq(i)
      rc.decode(acc, freq(i))
      freq(i) = (freq(i) + STEP).toChar
      tot += STEP
      if (tot > MAX_FREQ) normalize()
      val s = sym(i)
      if (freq(i) > freq(i - 1)) { // keep approximately frequency-sorted
        val tf = freq(i); freq(i) = freq(i - 1); freq(i - 1) = tf
        val ts = sym(i); sym(i) = sym(i - 1); sym(i - 1) = ts
      }
      s.toInt
    }
  }

  // ------------------------------------------------------------------
  // entropy kernels (order-0/1, with and without inline RLE)
  // ------------------------------------------------------------------

  private final val NSYM_RLE = 258
  private final val MAX_RUN = 4

  private def uncompressO0(in: Array[Byte], off: Int, end: Int, outSz: Int): Array[Byte] = {
    if (off >= end) throw new ArithException("arith: empty O0 payload")
    val m = { val v = in(off) & 0xff; if (v == 0) 256 else v }
    val model = new SimpleModel(256, m)
    val rc = new RangeDecoder(in, off + 1, end)
    val out = new Array[Byte](outSz)
    var i = 0
    while (i < outSz) { out(i) = model.decodeSymbol(rc).toByte; i += 1 }
    out
  }

  private def uncompressO1(in: Array[Byte], off: Int, end: Int, outSz: Int): Array[Byte] = {
    if (off >= end) throw new ArithException("arith: empty O1 payload")
    val m = { val v = in(off) & 0xff; if (v == 0) 256 else v }
    val models = Array.tabulate(256)(_ => new SimpleModel(256, m))
    val rc = new RangeDecoder(in, off + 1, end)
    val out = new Array[Byte](outSz)
    var last = 0
    var i = 0
    while (i < outSz) {
      val s = models(last).decodeSymbol(rc)
      out(i) = s.toByte
      last = s
      i += 1
    }
    out
  }

  /** Shared literal+run decode body for the two RLE kernels. */
  private def uncompressRle(in: Array[Byte], off: Int, end: Int, outSz: Int,
      order1: Boolean): Array[Byte] = {
    if (off >= end) throw new ArithException("arith: empty RLE payload")
    val m = { val v = in(off) & 0xff; if (v == 0) 256 else v }
    val litModels =
      if (order1) Array.tabulate(256)(_ => new SimpleModel(256, m))
      else Array(new SimpleModel(256, m))
    val runModels = Array.tabulate(NSYM_RLE)(_ => new SimpleModel(NSYM_RLE, MAX_RUN))
    val rc = new RangeDecoder(in, off + 1, end)
    val out = new Array[Byte](outSz)
    var last = 0
    var i = 0
    while (i < outSz) {
      val lit = litModels(if (order1) last else 0).decodeSymbol(rc)
      out(i) = lit.toByte
      last = lit
      var run = 0
      var rctx = lit
      var r = 0
      while ({
        r = runModels(rctx).decodeSymbol(rc)
        if (rctx == last) rctx = 256
        else if (rctx < NSYM_RLE - 1) rctx += 1
        run += r
        r == MAX_RUN - 1 && run < outSz
      }) ()
      while (run > 0 && i + 1 < outSz) { i += 1; out(i) = last.toByte; run -= 1 }
      i += 1
    }
    out
  }

  // ------------------------------------------------------------------
  // container dispatcher
  // ------------------------------------------------------------------

  /** uint7 (big-endian 7-bit groups, continuation bit on all but the
    * last byte) — the same varint the rANSNx16 container uses. */
  private final class Meta(val in: Array[Byte], var p: Int, val end: Int) {
    def u8(): Int = {
      if (p >= end) throw new ArithException("arith: truncated metadata")
      val v = in(p) & 0xff; p += 1; v
    }
    def u7(): Int = {
      var v = 0; var c = 0
      while ({ c = u8(); v = (v << 7) | (c & 0x7f); (c & 0x80) != 0 }) ()
      v
    }
  }

  def decode(in: Array[Byte], outLenHint: Int = -1): Array[Byte] =
    decode(in, 0, in.length, outLenHint)

  /** Decode one complete arith-dynamic stream starting at `off` with
    * `len` available bytes (the stream may use fewer — callers track
    * consumption via their own stored compressed lengths). */
  def decode(in: Array[Byte], off: Int, len: Int, outLenHint: Int): Array[Byte] = {
    if (len <= 0) throw new ArithException("arith: empty input")
    val flags = in(off) & 0xff

    if ((flags & 0x08) != 0) { // X_STRIPE
      val r = new Meta(in, off + 1, off + len)
      val ulen = r.u7()
      if (ulen < 0 || ulen > (1 << 28))
        throw new ArithException(s"arith: implausible stripe size $ulen")
      val n = r.u8()
      if (n < 1) throw new ArithException("arith: stripe with zero streams")
      val clen = new Array[Int](n)
      val sublen = new Array[Int](n)
      var i = 0
      while (i < n) {
        sublen(i) = ulen / n + (if (ulen % n > i) 1 else 0)
        clen(i) = r.u7()
        i += 1
      }
      val out = new Array[Byte](ulen)
      var base = r.p
      i = 0
      while (i < n) {
        val sub = decode(in, base, clen(i), sublen(i))
        if (sub.length != sublen(i))
          throw new ArithException(
            s"arith: stripe sub-stream $i decoded ${sub.length}, expected ${sublen(i)}")
        var j = 0
        var o = i
        while (j < sub.length) { out(o) = sub(j); o += n; j += 1 }
        base += clen(i)
        i += 1
      }
      return out
    }

    val r = new Meta(in, off + 1, off + len)
    val order = flags & 3
    val doExt = (flags & 0x04) != 0
    val noSz = (flags & 0x10) != 0
    val doCat = (flags & 0x20) != 0
    val doRle = (flags & 0x40) != 0
    val doPack = (flags & 0x80) != 0

    val osz =
      if (!noSz) r.u7()
      else if (outLenHint >= 0) outLenHint
      else throw new ArithException("arith: NOSZ stream needs an expected size")
    // bound allocations on corrupt headers (typed error, not OOM)
    if (osz < 0 || osz > (1 << 28))
      throw new ArithException(s"arith: implausible uncompressed size $osz")

    // PACK metadata: symbol count, map (when <=16 syms), packed length
    var packMap: Array[Byte] = null
    var packPerByte = 1
    var payloadLen = osz
    if (doPack) {
      var n = r.u8()
      if (n == 0) n = 256
      packPerByte =
        if (n <= 1) 0 else if (n <= 2) 8 else if (n <= 4) 4 else if (n <= 16) 2 else 1
      if (packPerByte != 1) {
        packMap = new Array[Byte](n)
        var c = 0
        while (c < n) { packMap(c) = r.u8().toByte; c += 1 }
      }
      payloadLen = r.u7()
    }

    val packed: Array[Byte] =
      if (r.end - r.p <= 0) new Array[Byte](0)
      else if (doCat) {
        if (payloadLen > r.end - r.p)
          throw new ArithException("arith: CAT length overruns input")
        java.util.Arrays.copyOfRange(in, r.p, r.p + payloadLen)
      } else if (doExt) {
        // external codec by magic number; the reference builds with bz2
        val bis = new org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream(
          new java.io.ByteArrayInputStream(in, r.p, r.end - r.p))
        val b = try bis.readAllBytes() finally bis.close()
        if (b.length != payloadLen)
          throw new ArithException(s"arith: EXT decoded ${b.length}, expected $payloadLen")
        b
      } else if (doRle) uncompressRle(in, r.p, r.end, payloadLen, order == 1)
      else if (order == 1) uncompressO1(in, r.p, r.end, payloadLen)
      else uncompressO0(in, r.p, r.end, payloadLen)

    if (!doPack) {
      if (packed.length != osz)
        throw new ArithException(s"arith: decoded ${packed.length}, expected $osz")
      packed
    } else if (packPerByte == 1) packed // >16 symbols: count byte only, no packing
    else unpackBits(packed, osz, packPerByte, packMap)
  }

  /** Bit-unpack `perByte` symbols per input byte, low bits first —
    * identical layout to rANSNx16 PACK (reference htscodecs pack.c
    * hts_unpack). */
  private def unpackBits(in: Array[Byte], osz: Int, perByte: Int,
      map: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](osz)
    perByte match {
      case 0 =>
        java.util.Arrays.fill(out, map(0))
      case 8 =>
        var i = 0
        while (i < osz) {
          val c = in(i >> 3) & 0xff
          out(i) = map((c >> (i & 7)) & 1)
          i += 1
        }
      case 4 =>
        var i = 0
        while (i < osz) {
          val c = in(i >> 2) & 0xff
          out(i) = map((c >> ((i & 3) << 1)) & 3)
          i += 1
        }
      case 2 =>
        var i = 0
        while (i < osz) {
          val c = in(i >> 1) & 0xff
          out(i) = map((c >> ((i & 1) << 2)) & 15)
          i += 1
        }
      case other =>
        throw new ArithException(s"arith: bad pack arity $other")
    }
    out
  }
}
