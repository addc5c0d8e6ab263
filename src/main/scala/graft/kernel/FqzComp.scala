package graft.kernel

import graft.kernel.ArithDynamic.{ArithException, RangeDecoder, SimpleModel}

/** fqzcomp quality-score codec decoder — CRAM 3.1 block compression
  * method 7. Qualities are coded with one adaptive model per 16-bit
  * context built from the previous quality values (qtab/qbits), the
  * position in the read (ptab), the running delta count (dtab) and an
  * optional per-read selector; read lengths, duplicate-read flags and
  * reverse markers are coded by dedicated side models in the same
  * range-coder stream.
  *
  * Written from the public CRAM 3.1 codecs specification ("fqzcomp
  * quality codec"); the parameter-block layout (version 5), the
  * double-run-length array serialisation, the context update rule and
  * the quirk that the per-base loop always uses parameter block 0's
  * tables (only per-read length/dedup/start-context honour the
  * selected block) cross-checked against the reference's vendored
  * htscodecs (reference: ext/htslib-1.22.1/htscodecs/htscodecs/
  * fqzcomp_qual.c:1240-1616) and validated bit-for-bit against its
  * committed golden vectors (htscodecs/tests/dat/fqzcomp).
  *
  * Scale note: one sequential pass per block; the 65536-context model
  * table is allocated lazily (a block typically touches a small
  * fraction), bounding per-task memory. Parallelism comes from the
  * CRAM source's per-file task planning.
  */
object FqzComp {

  private final val CTX_SIZE = 1 << 16
  private final val QMAX = 256

  private final val GFLAG_MULTI_PARAM = 1
  private final val GFLAG_HAVE_STAB = 2
  private final val GFLAG_DO_REV = 4

  private final val PFLAG_DO_DEDUP = 2
  private final val PFLAG_DO_LEN = 4
  private final val PFLAG_DO_SEL = 8
  private final val PFLAG_HAVE_QMAP = 16
  private final val PFLAG_HAVE_PTAB = 32
  private final val PFLAG_HAVE_DTAB = 64
  private final val PFLAG_HAVE_QTAB = 128

  private final val FQZ_VERS = 5

  private final class Param {
    var context = 0
    var pflags = 0
    var maxSym = 0
    var qbits = 0; var qmask = 0; var qshift = 0
    var qloc = 0; var sloc = 0; var ploc = 0; var dloc = 0
    var doSel = false; var fixedLen = false; var doDedup = false
    val qmap = new Array[Int](256)
    val qtab = new Array[Int](256)
    val ptab = new Array[Int](1024)
    val dtab = new Array[Int](256)
  }

  /** uint7 (big-endian 7-bit groups) reader; advances `p`. */
  private final class Cursor(val in: Array[Byte], var p: Int) {
    def u8(): Int = {
      if (p >= in.length) throw new ArithException("fqz: truncated parameters")
      val v = in(p) & 0xff; p += 1; v
    }
    def u7(): Int = {
      var v = 0; var c = 0
      while ({ c = u8(); v = (v << 7) | (c & 0x7f); (c & 0x80) != 0 }) ()
      v
    }
  }

  /** Double-run-length array decode (reference fqzcomp_qual.c
    * read_array): outer RLE (a repeated byte is followed by an extra
    * copy count), inner RLE (per-value run lengths, 255 = continue). */
  private def readArray(c: Cursor, size: Int): Array[Int] = {
    val r = new Array[Int](1024)
    var j = 0; var z = 0; var last = -1
    while (z < size && c.p < c.in.length) {
      val run = c.u8()
      if (j >= 1024) throw new ArithException("fqz: run-length array overflow")
      r(j) = run; j += 1
      z += run
      if (run == last) {
        var copy = c.u8()
        z += run * copy
        while (copy > 0 && z <= size && j < 1024) { r(j) = run; j += 1; copy -= 1 }
      }
      if (j > 1024) throw new ArithException("fqz: run-length array overflow")
      last = run
    }
    val rMax = j
    val out = new Array[Int](size)
    var i = 0; var o = 0; z = 0
    while (o < size) {
      var runLen = 0
      var runPart = 0
      if (z >= rMax) throw new ArithException("fqz: truncated run-length array")
      while ({
        runPart = r(z); z += 1
        runLen += runPart
        runPart == 255 && z < rMax
      }) ()
      if (runPart == 255) throw new ArithException("fqz: unterminated 255 run")
      while (runLen > 0 && o < size) { out(o) = i; o += 1; runLen -= 1 }
      i += 1
    }
    out
  }

  private def readParam(c: Cursor): Param = {
    val pm = new Param
    pm.context = c.u8() | (c.u8() << 8)
    pm.pflags = c.u8()
    pm.doSel = (pm.pflags & PFLAG_DO_SEL) != 0
    pm.fixedLen = (pm.pflags & PFLAG_DO_LEN) != 0
    pm.doDedup = (pm.pflags & PFLAG_DO_DEDUP) != 0
    pm.maxSym = c.u8()
    var b = c.u8()
    pm.qbits = b >> 4; pm.qshift = b & 15
    pm.qmask = (1 << pm.qbits) - 1
    b = c.u8()
    pm.qloc = b >> 4; pm.sloc = b & 15
    b = c.u8()
    pm.ploc = b >> 4; pm.dloc = b & 15

    if ((pm.pflags & PFLAG_HAVE_QMAP) != 0) {
      var i = 0
      while (i < pm.maxSym) { pm.qmap(i) = c.u8(); i += 1 }
      while (i < 256) { pm.qmap(i) = Int.MaxValue; i += 1 }
    } else {
      var i = 0
      while (i < 256) { pm.qmap(i) = i; i += 1 }
    }

    if (pm.qbits != 0) {
      if ((pm.pflags & PFLAG_HAVE_QTAB) != 0)
        System.arraycopy(readArray(c, 256), 0, pm.qtab, 0, 256)
      else {
        var i = 0
        while (i < 256) { pm.qtab(i) = i; i += 1 }
      }
    }

    if ((pm.pflags & PFLAG_HAVE_PTAB) != 0)
      System.arraycopy(readArray(c, 1024), 0, pm.ptab, 0, 1024)
    if ((pm.pflags & PFLAG_HAVE_DTAB) != 0)
      System.arraycopy(readArray(c, 256), 0, pm.dtab, 0, 256)
    pm
  }

  /** Decode a complete fqzcomp stream; returns the quality bytes. */
  def decode(in: Array[Byte], outLenHint: Int = -1): Array[Byte] =
    decodeWithLengths(in, outLenHint)._1

  /** Decode returning (qualities, per-record read lengths). */
  def decodeWithLengths(in: Array[Byte], outLenHint: Int = -1): (Array[Byte], Array[Int]) = {
    val c = new Cursor(in, 0)
    val len = c.u7()
    if (outLenHint >= 0 && len != outLenHint)
      throw new ArithException(s"fqz: stream says $len bytes, block header says $outLenHint")
    // bound allocations on corrupt headers (typed error, not OOM);
    // 1<<28 comfortably exceeds any legal CRAM slice's quality block
    if (len < 0 || len > (1 << 28))
      throw new ArithException(s"fqz: implausible uncompressed size $len")

    // global parameter block
    val vers = c.u8()
    if (vers != FQZ_VERS)
      throw new ArithException(s"fqz: format version $vers (only $FQZ_VERS supported)")
    val gflags = c.u8()
    val nparam = if ((gflags & GFLAG_MULTI_PARAM) != 0) c.u8() else 1
    if (nparam <= 0) throw new ArithException("fqz: no parameter blocks")
    var maxSel = if (nparam > 1) nparam else 0
    val stab = new Array[Int](256)
    if ((gflags & GFLAG_HAVE_STAB) != 0) {
      maxSel = c.u8()
      System.arraycopy(readArray(c, 256), 0, stab, 0, 256)
    } else {
      var i = 0
      while (i < nparam) { stab(i) = i; i += 1 }
      while (i < 256) { stab(i) = nparam - 1; i += 1 }
    }
    val params = Array.fill(nparam)(readParam(c))
    var maxSym = 0
    for (pm <- params) {
      if (pm.doSel && maxSel == 0)
        throw new ArithException("fqz: selector used but no selector table")
      maxSym = math.max(maxSym, pm.maxSym)
      // fold the location shifts into the tables once, like the reference
      var j = 0
      while (j < 1024) { pm.ptab(j) <<= pm.ploc; j += 1 }
      j = 0
      while (j < 256) { pm.dtab(j) <<= pm.dloc; j += 1 }
    }

    // models: the 65k qual contexts are lazily built
    val qualModels = new Array[SimpleModel](CTX_SIZE)
    val qualSyms = maxSym + 1
    def qual(ctx: Int): SimpleModel = {
      var m = qualModels(ctx)
      if (m == null) { m = new SimpleModel(QMAX, qualSyms); qualModels(ctx) = m }
      m
    }
    val lenModels = Array.fill(4)(new SimpleModel(256, 256))
    val revModel = new SimpleModel(2, 2)
    val dupModel = new SimpleModel(2, 2)
    val selModel = if (maxSel > 0) new SimpleModel(256, maxSel + 1) else null

    val rc = new RangeDecoder(in, c.p, in.length)
    val out = new Array[Byte](len)
    val lens = new scala.collection.mutable.ArrayBuffer[Int]
    val revs = new scala.collection.mutable.ArrayBuffer[Boolean]

    // per-stream state
    var qctx = 0; var delta = 0; var prevq = 0
    var p = 0; var sel = 0
    var firstLen = true; var lastLen = 0
    var last = 0
    val pm0 = params(0) // per-base loop always uses block 0 (reference quirk)

    var i = 0
    while (i < len) {
      if (p == 0) {
        // new read: selector, length, reverse flag, dedup
        sel = if (pm0.doSel) selModel.decodeSymbol(rc) else 0
        val x = if ((gflags & GFLAG_HAVE_STAB) != 0) stab(math.min(255, sel)) else sel
        if (x >= nparam) throw new ArithException("fqz: selector beyond parameter count")
        val pm = params(x)

        var rlen = lastLen
        if (!pm.fixedLen || firstLen) {
          rlen = lenModels(0).decodeSymbol(rc)
          rlen |= lenModels(1).decodeSymbol(rc) << 8
          rlen |= lenModels(2).decodeSymbol(rc) << 16
          rlen |= lenModels(3).decodeSymbol(rc) << 24
          firstLen = false
          lastLen = rlen
        }
        if (rlen <= 0 || rlen > len - i)
          throw new ArithException(s"fqz: read length $rlen overruns block")
        lens += rlen

        val rev =
          if ((gflags & GFLAG_DO_REV) != 0) revModel.decodeSymbol(rc) != 0 else false
        revs += rev

        var dup = false
        if (pm.doDedup && dupModel.decodeSymbol(rc) != 0) {
          if (rlen > i) throw new ArithException("fqz: dup before first read")
          System.arraycopy(out, i - rlen, out, i, rlen)
          i += rlen
          dup = true
        }

        if (!dup) {
          p = rlen
          delta = 0; prevq = 0; qctx = 0
          last = pm.context
        }
      } else {
        throw new ArithException("fqz: internal state error") // p==0 is the only entry
      }

      // per-base decode for this read (always parameter block 0's tables)
      while (p != 0 && i < len) {
        val q = qual(last).decodeSymbol(rc)
        // context update (reference fqz_update_ctx)
        qctx = (qctx << pm0.qshift) + pm0.qtab(q)
        var ctx = (qctx & pm0.qmask) << pm0.qloc
        ctx += pm0.ptab(math.min(1023, p))
        ctx += pm0.dtab(math.min(255, delta))
        ctx += sel << pm0.sloc
        if (prevq != q) delta += 1
        prevq = q
        p -= 1
        last = ctx & (CTX_SIZE - 1)
        out(i) = pm0.qmap(q).toByte
        i += 1
      }
    }

    // undo per-read reversal (CRAM 3.1 streams store reversed reads)
    if ((gflags & GFLAG_DO_REV) != 0) {
      var base = 0
      var r = 0
      while (r < lens.length && base < len) {
        val l = lens(r)
        if (revs(r)) {
          var a = base; var b = math.min(base + l, len) - 1
          while (a < b) {
            val t = out(a); out(a) = out(b); out(b) = t
            a += 1; b -= 1
          }
        }
        base += l
        r += 1
      }
    }

    (out, lens.toArray)
  }
}
