package graft.kernel

/** rANS Nx16 decoder (the htscodecs "rANS 4x16 / 32x16" entropy codec
  * used by CRAM 3.x block method 5), written to the public CRAM codecs
  * specification; decode behavior validated bit-for-bit against the
  * reference's committed golden vectors
  * (reference: ext/htslib-1.22.1/htscodecs/tests/dat/r4x16/q4.*, the
  * formats in ext/htslib-1.22.1/htscodecs/htscodecs/rANS_static4x16pr.c
  * and rANS_static16_int.h).
  *
  * Supported: order-0 / order-1, 4-way and 32-way (X32) interleaving,
  * STRIPE, CAT, NOSZ, RLE and PACK transforms, compressed order-1
  * frequency tables, 10-bit and 12-bit order-1 tables. That is the
  * full decode surface of the codec.
  *
  * Layout recap (all integers little-endian; "uint7" is the 7-bit
  * big-endian varint with continuation in the top bit):
  *  - flags byte: 0x01 order-1, 0x04 X32, 0x08 STRIPE, 0x10 NOSZ,
  *    0x20 CAT, 0x40 RLE, 0x80 PACK
  *  - STRIPE: uint7 ulen, byte N, N× uint7 sub-stream compressed
  *    lengths, then N independently-encoded sub-streams; output byte i
  *    comes from sub-stream i%N at position i/N
  *  - otherwise: uint7 uncompressed size unless NOSZ; PACK meta
  *    (symbol count, symbol map, uint7 packed size) then RLE meta
  *    (uint7 sizes + optionally rANS-compressed run-length block),
  *    then the rANS payload (or raw bytes under CAT); inverse
  *    transforms apply rANS → un-RLE → un-PACK.
  * States renormalize from 16-bit words when below 1<<15; order-1
  * splits the output into N slices with the last state owning the
  * remainder, each slice carrying its own previous-byte context.
  */
object RansNx16 {
  final class RansException(msg: String) extends RuntimeException(msg)

  private val L = 1 << 15 // renormalization lower bound
  private val Tf0Shift = 12 // order-0 frequency precision

  private final class Reader(val a: Array[Byte], var p: Int, val end: Int) {
    def u8(): Int = {
      if (p >= end) throw new RansException("rANSNx16: input truncated")
      val v = a(p) & 0xff; p += 1; v
    }
    /** 7-bit big-endian varint. */
    def u7(): Int = {
      var v = 0
      var c = 0
      do {
        c = u8()
        v = (v << 7) | (c & 0x7f)
      } while ((c & 0x80) != 0)
      v
    }
    def u32le(): Int = u8() | (u8() << 8) | (u8() << 16) | (u8() << 24)
    /** One-step 16-bit renorm; reads nothing once the input is drained
      * (the encoder pads final states, mirroring the safe renorm). */
    def renorm(x: Int): Int =
      if (Integer.compareUnsigned(x, L) < 0 && p + 1 < end) {
        val y = (a(p) & 0xff) | ((a(p + 1) & 0xff) << 8)
        p += 2
        (x << 16) | y
      } else x
  }

  /** Decode a complete rANSNx16 stream. `outLenHint` supplies the
    * uncompressed size for NOSZ streams (CRAM block headers carry it);
    * -1 means the stream must carry its own size.
    */
  def decode(in: Array[Byte], outLenHint: Int = -1): Array[Byte] =
    decode(in, 0, in.length, outLenHint)

  def decode(in: Array[Byte], off: Int, len: Int, outLenHint: Int): Array[Byte] = {
    if (len <= 0) throw new RansException("rANSNx16: empty input")
    val flags = in(off) & 0xff

    if ((flags & 0x08) != 0) { // STRIPE
      val r = new Reader(in, off + 1, off + len)
      val ulen = r.u7()
      val n = r.u8()
      if (n < 1) throw new RansException("rANSNx16: stripe with zero streams")
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
          throw new RansException(s"rANSNx16: stripe sub-stream $i decoded ${sub.length}, expected ${sublen(i)}")
        // out[j*n + i] = sub[j]
        var j = 0
        var o = i
        while (j < sub.length) { out(o) = sub(j); o += n; j += 1 }
        base += clen(i)
        i += 1
      }
      return out
    }

    val r = new Reader(in, off + 1, off + len)
    val order = flags & 1
    val x32 = (flags & 0x04) != 0
    val doPack = (flags & 0x80) != 0
    val doRle = (flags & 0x40) != 0
    val doCat = (flags & 0x20) != 0
    val noSz = (flags & 0x10) != 0
    val osz =
      if (!noSz) r.u7()
      else if (outLenHint >= 0) outLenHint
      else throw new RansException("rANSNx16: NOSZ stream needs an expected size")

    // PACK meta: symbol count, map, then the packed stream's size
    var packMap: Array[Byte] = null
    var packPerByte = 0 // symbols packed per output... (8/4/2 per byte; 1 = none; 0 = constant fill)
    var ransLen = osz
    if (doPack) {
      var n = r.u8()
      if (n == 0) n = 256
      packPerByte =
        if (n <= 1) 0 else if (n <= 2) 8 else if (n <= 4) 4 else if (n <= 16) 2 else 1
      if (packPerByte != 1) {
        packMap = new Array[Byte](n)
        var c = 0
        while (c < n) { packMap(c) = r.u8().toByte; c += 1 }
      } // n>16: no packing — the count byte is the whole meta, no map
      ransLen = r.u7()
    }

    // RLE meta: lengths + (possibly rANS-compressed) run metadata
    var rleMeta: Array[Byte] = null
    var rleLen = 0
    if (doRle) {
      var uMeta = r.u7()
      rleLen = r.u7()
      if ((uMeta & 1) != 0) {
        uMeta /= 2
        rleMeta = java.util.Arrays.copyOfRange(in, r.p, math.min(r.p + uMeta, r.end))
        r.p += uMeta
      } else {
        val cMeta = r.u7()
        uMeta /= 2
        rleMeta = ransCore(in, r.p, cMeta, uMeta, 0, if (x32) 32 else 4)
        r.p += cMeta
      }
      ransLen = rleLen
    }

    // payload: rANS (or raw under CAT) → tmp1
    val tmp1: Array[Byte] =
      if (r.end - r.p <= 0) new Array[Byte](0)
      else if (doCat) {
        if (ransLen > r.end - r.p) throw new RansException("rANSNx16: CAT length overruns input")
        java.util.Arrays.copyOfRange(in, r.p, r.p + ransLen)
      } else ransCore(in, r.p, r.end - r.p, ransLen, order, if (x32) 32 else 4)

    // un-RLE → tmp2
    val tmp2: Array[Byte] =
      if (!doRle) tmp1
      else {
        val nsyms0 = rleMeta(0) & 0xff
        val nsyms = if (nsyms0 == 0) 256 else nsyms0
        val runSaved = new Array[Boolean](256)
        var i = 0
        while (i < nsyms) { runSaved(rleMeta(1 + i) & 0xff) = true; i += 1 }
        val runs = new Reader(rleMeta, 1 + nsyms, rleMeta.length)
        val cap = if (doPack) ransLenCap(osz, packPerByte) else osz
        val out = new Array[Byte](cap)
        var o = 0
        i = 0
        while (i < tmp1.length) {
          val b = tmp1(i) & 0xff
          if (runSaved(b)) {
            val rl = runs.u7()
            if (o + rl + 1 > out.length)
              throw new RansException("rANSNx16: RLE expands past output")
            java.util.Arrays.fill(out, o, o + rl + 1, b.toByte)
            o += rl + 1
          } else {
            if (o >= out.length) throw new RansException("rANSNx16: RLE expands past output")
            out(o) = b.toByte; o += 1
          }
          i += 1
        }
        if (o == cap) out else java.util.Arrays.copyOf(out, o)
      }

    // un-PACK → final
    if (!doPack) {
      if (tmp2.length != osz)
        throw new RansException(s"rANSNx16: decoded ${tmp2.length}, expected $osz")
      tmp2
    } else unpack(tmp2, osz, packPerByte, packMap)
  }

  /** Upper bound on the pre-unpack stream length for `osz` output
    * bytes at `perByte` symbols per byte. */
  private def ransLenCap(osz: Int, perByte: Int): Int =
    if (perByte <= 1) osz else (osz + perByte - 1) / perByte

  private def unpack(in: Array[Byte], osz: Int, perByte: Int, map: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](osz)
    perByte match {
      case 0 => // single-symbol alphabet: constant fill
        java.util.Arrays.fill(out, map(0))
      case 1 => // no packing
        if (in.length < osz) throw new RansException("rANSNx16: pack underrun")
        System.arraycopy(in, 0, out, 0, osz)
      case 8 => // 1 bit per symbol, low bits first
        var i = 0
        while (i < osz) {
          val c = in(i >> 3) & 0xff
          out(i) = map((c >> (i & 7)) & 1)
          i += 1
        }
      case 4 => // 2 bits per symbol
        var i = 0
        while (i < osz) {
          val c = in(i >> 2) & 0xff
          out(i) = map((c >> ((i & 3) << 1)) & 3)
          i += 1
        }
      case 2 => // 4 bits per symbol
        var i = 0
        while (i < osz) {
          val c = in(i >> 1) & 0xff
          out(i) = map((c >> ((i & 1) << 2)) & 15)
          i += 1
        }
      case other => throw new RansException(s"rANSNx16: bad pack arity $other")
    }
    out
  }

  // ---- alphabet / frequency tables -------------------------------------

  /** Present-symbol list with the +1-run shorthand; marks F(sym)=1. */
  private def decodeAlphabet(r: Reader, present: Array[Int]): Unit = {
    var rle = 0
    var j = r.u8()
    var continue = true
    while (continue) {
      present(j) = 1
      if (rle > 0) {
        rle -= 1
        j += 1
        if (j > 255) throw new RansException("rANSNx16: alphabet overflow")
      } else {
        val nj = r.u8()
        if (nj == j + 1) rle = r.u8()
        j = nj
      }
      if (j == 0) continue = false
    }
  }

  /** Scale frequencies summing to a power of two up to `target`. */
  private def normaliseShift(f: Array[Int], sum: Int, target: Int): Unit = {
    if (sum == 0 || sum == target) return
    var s = sum
    var shift = 0
    while (s < target) { s *= 2; shift += 1 }
    var i = 0
    while (i < 256) { f(i) <<= shift; i += 1 }
  }

  // ---- core N-state rANS ------------------------------------------------

  private def ransCore(in: Array[Byte], off: Int, len: Int, outLen: Int,
      order: Int, nStates: Int): Array[Byte] = {
    val r = new Reader(in, off, off + len)
    if (order == 0) ransO0(r, outLen, nStates) else ransO1(r, outLen, nStates)
  }

  private def ransO0(r: Reader, outLen: Int, n: Int): Array[Byte] = {
    val freq = new Array[Int](256)
    decodeAlphabet(r, freq)
    var sum = 0
    var j = 0
    while (j < 256) {
      if (freq(j) != 0) { freq(j) = r.u7(); sum += freq(j) }
      j += 1
    }
    normaliseShift(freq, sum, 1 << Tf0Shift)

    val ssym = new Array[Byte](1 << Tf0Shift)
    val sfreq = new Array[Int](1 << Tf0Shift)
    val sbase = new Array[Int](1 << Tf0Shift)
    var x = 0
    j = 0
    while (j < 256) {
      val f = freq(j)
      if (f > 0) {
        if (f > (1 << Tf0Shift) - x) throw new RansException("rANSNx16: O0 frequency overflow")
        var y = 0
        while (y < f) {
          ssym(x + y) = j.toByte; sfreq(x + y) = f; sbase(x + y) = y
          y += 1
        }
        x += f
      }
      j += 1
    }
    if (x != (1 << Tf0Shift)) throw new RansException("rANSNx16: O0 frequencies do not fill table")

    val R = new Array[Int](n)
    var z = 0
    while (z < n) {
      R(z) = r.u32le()
      z += 1
    }
    val out = new Array[Byte](outLen)
    val mask = (1 << Tf0Shift) - 1
    var i = 0
    while (i < outLen) {
      z = i % n
      val m = R(z) & mask
      out(i) = ssym(m)
      R(z) = sfreq(m) * (R(z) >>> Tf0Shift) + sbase(m)
      R(z) = r.renorm(R(z))
      i += 1
    }
    out
  }

  private def ransO1(r: Reader, outLen: Int, n: Int): Array[Byte] = {
    val head = r.u8()
    val shift = head >> 4
    if (shift != 10 && shift != 12)
      throw new RansException(s"rANSNx16: O1 shift $shift not 10/12")

    // frequency tables, possibly themselves order-0 compressed
    var fr = r
    var tabEnd = -1
    if ((head & 1) != 0) {
      val uSz = r.u7()
      val cSz = r.u7()
      val tab = ransCore(r.a, r.p, cSz, uSz, 0, 4) // header always 4-way
      r.p += cSz
      tabEnd = r.p
      fr = new Reader(tab, 0, tab.length)
    }

    val present = new Array[Int](256)
    decodeAlphabet(fr, present)

    val tot = 1 << shift
    val mask = tot - 1
    // per-context cumulative tables, allocated only for present contexts
    val csym = new Array[Array[Byte]](256)
    val cfreq = new Array[Array[Int]](256)
    val cbase = new Array[Array[Int]](256)
    var i = 0
    while (i < 256) {
      if (present(i) != 0) {
        val f = new Array[Int](256)
        var t = 0
        var dz = 0
        var j = 0
        while (j < 256) {
          if (present(j) != 0) {
            var v = 0
            if (dz > 0) { dz -= 1 }
            else {
              v = fr.u7()
              if (v == 0) dz = fr.u8()
            }
            f(j) = v
            t += v
          }
          j += 1
        }
        if (t != 0) {
          normaliseShift(f, t, tot)
          val sy = new Array[Byte](tot)
          val sf = new Array[Int](256)
          val sb = new Array[Int](256)
          var x = 0
          j = 0
          while (j < 256) {
            val fj = f(j)
            if (fj > 0) {
              if (fj > tot - x) throw new RansException("rANSNx16: O1 frequency overflow")
              java.util.Arrays.fill(sy, x, x + fj, j.toByte)
              sf(j) = fj
              sb(j) = x
              x += fj
            }
            j += 1
          }
          if (x != tot) throw new RansException("rANSNx16: O1 frequencies do not fill table")
          csym(i) = sy; cfreq(i) = sf; cbase(i) = sb
        }
      }
      i += 1
    }
    if (tabEnd >= 0) r.p = tabEnd

    val R = new Array[Int](n)
    var z = 0
    while (z < n) { R(z) = r.u32le(); z += 1 }

    val out = new Array[Byte](outLen)
    val slice = outLen / n
    val pos = new Array[Int](n)
    val ctx = new Array[Int](n)
    z = 0
    while (z < n) { pos(z) = z * slice; z += 1 }

    def step(z: Int, o: Int): Unit = {
      val l = ctx(z)
      val sy = csym(l)
      if (sy == null) throw new RansException(s"rANSNx16: O1 context $l has no table")
      val m = R(z) & mask
      val c = sy(m) & 0xff
      out(o) = c.toByte
      R(z) = cfreq(l)(c) * (R(z) >>> shift) + m - cbase(l)(c)
      R(z) = r.renorm(R(z))
      ctx(z) = c
    }

    var k = 0
    while (k < slice) {
      z = 0
      while (z < n) {
        step(z, pos(z))
        pos(z) += 1
        z += 1
      }
      k += 1
    }
    // the last state owns the remainder
    var o = pos(n - 1)
    while (o < outLen) {
      step(n - 1, o)
      o += 1
      pos(n - 1) = o
    }
    out
  }
}
