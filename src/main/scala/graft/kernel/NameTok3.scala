package graft.kernel

/** tok3 read-name codec decoder — CRAM 3.1 block compression method 8
  * and the htscodecs "name tokeniser". Read names are modelled as
  * token sequences (alpha runs, digit runs with or without leading
  * zeros, single chars, end marker); per-token-position byte streams
  * carry either the literal values or references against a previous
  * name (MATCH / delta / whole-line DUP), and each stream is entropy
  * coded with rANSNx16 ([[RansNx16]]) or the adaptive arithmetic coder
  * ([[ArithDynamic]]).
  *
  * Written from the public CRAM 3.1 codecs specification ("Name
  * tokenisation codec"); the serialized descriptor layout (new-token /
  * dup-stream flag bits, the implicit all-MATCH type stream
  * optimisation), token enum order and the fixed- vs variable-width
  * decimal reconstruction rules cross-checked against the reference's
  * vendored htscodecs (reference: ext/htslib-1.22.1/htscodecs/
  * htscodecs/tokenise_name3.c:1023-1211,1679-1836) and validated
  * bit-for-bit against its committed golden vectors
  * (htscodecs/tests/names/tok3 at every level 1..19 vs names).
  *
  * Output is the uncompressed name block exactly as CRAM stores it:
  * NUL-terminated names, ready for the existing BYTE_ARRAY_STOP /
  * BYTE_ARRAY_LEN data-series machinery in [[CramCodec]].
  *
  * Scale note: one pass, O(total name bytes) with per-block state only
  * — blocks are bounded (1M names max per the format), and multi-slice
  * parallelism comes from the CRAM source's per-file task planning.
  */
object NameTok3 {

  final class Tok3Exception(msg: String) extends IllegalArgumentException(msg)

  // token types, in the format's enum order
  private final val N_TYPE = 0
  private final val N_ALPHA = 1
  private final val N_CHAR = 2
  private final val N_DIGITS0 = 3
  private final val N_DZLEN = 4
  private final val N_DUP = 5
  private final val N_DIGITS = 7
  private final val N_DDELTA = 8
  private final val N_DDELTA0 = 9
  private final val N_MATCH = 10
  private final val N_NOP = 11
  private final val N_END = 12

  private final val MAX_TOKENS = 128
  private final val MAX_TBLOCKS = MAX_TOKENS << 4

  /** One token-position byte stream with its read cursor. */
  private final class Desc {
    var buf: Array[Byte] = null
    var pos: Int = 0
    def remaining: Int = if (buf == null) 0 else buf.length - pos
    def nextByte(): Int = {
      if (buf == null || pos >= buf.length)
        throw new Tok3Exception("tok3: token stream exhausted")
      val v = buf(pos) & 0xff; pos += 1; v
    }
    def nextU32(): Int = {
      if (buf == null || pos + 4 > buf.length)
        throw new Tok3Exception("tok3: token stream exhausted (u32)")
      val v = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
        ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
      pos += 4; v
    }
    /** NUL-terminated string; returns the bytes before the NUL. */
    def nextAlpha(): Array[Byte] = {
      if (buf == null || pos >= buf.length)
        throw new Tok3Exception("tok3: token stream exhausted (alpha)")
      var e = pos
      while (e < buf.length && buf(e) != 0) e += 1
      val out = java.util.Arrays.copyOfRange(buf, pos, e)
      pos = if (e < buf.length) e + 1 else e
      out
    }
  }

  /** Decoded token value retained for MATCH/delta references. */
  private final class Tok {
    var ttype: Int = N_NOP
    var ival: Int = 0 // numeric value, or CHAR code, or ALPHA length
    var width: Int = 0 // DIGITS0 field width
    var alpha: Array[Byte] = null
  }

  private def u32le(in: Array[Byte], p: Int): Int =
    (in(p) & 0xff) | ((in(p + 1) & 0xff) << 8) | ((in(p + 2) & 0xff) << 16) |
      ((in(p + 3) & 0xff) << 24)

  /** uint7 (big-endian 7-bit groups), returning (value, bytesConsumed). */
  private def varU32(in: Array[Byte], p: Int, end: Int): (Int, Int) = {
    var v = 0; var q = p; var c = 0
    while ({
      if (q >= end) throw new Tok3Exception("tok3: truncated varint")
      c = in(q) & 0xff; q += 1
      v = (v << 7) | (c & 0x7f)
      (c & 0x80) != 0
    }) ()
    (v, q - p)
  }

  /** Peek the uncompressed size of the entropy stream at `p`: skip the
    * stored compressed length varint and the codec's flag byte, then
    * read its own size varint (valid for both rANSNx16 and arith
    * containers, striped or not — neither uses NOSZ at top level). */
  private def peekUlen(in: Array[Byte], p: Int, end: Int): Int = {
    val (_, nb) = varU32(in, p, end)
    varU32(in, p + nb + 1, end)._1
  }

  /** Decode a complete tok3 stream to the NUL-separated name block. */
  def decode(in: Array[Byte]): Array[Byte] = {
    if (in.length < 9) throw new Tok3Exception("tok3: input shorter than header")
    val ulen = u32le(in, 0)
    val nreads = u32le(in, 4)
    val useArith = (in(8) & 0xff) != 0
    // bound allocations on corrupt headers: a flipped bit must yield a
    // typed error, not an executor-killing multi-GB allocation. The
    // format caps blocks at 1M names; names are NUL-terminated so
    // ulen >= nreads; 1<<28 comfortably exceeds any legal block.
    if (ulen < 0 || nreads < 0 || ulen > (1 << 28) ||
        nreads > 1000000 || nreads > ulen + 1)
      throw new Tok3Exception(s"tok3: implausible header ulen=$ulen nreads=$nreads")

    val desc = Array.fill(MAX_TBLOCKS)(new Desc)
    var maxTok = 0
    var tnum = -1
    var o = 9

    // unpack the per-(token,type) descriptor streams
    while (o < in.length) {
      val ttype = in(o) & 0xff; o += 1

      if ((ttype & 128) != 0) {
        tnum += 1
        if (tnum >= MAX_TOKENS) throw new Tok3Exception("tok3: too many tokens")
        maxTok = tnum + 1
        var k = tnum << 4
        val kEnd = k + 16
        while (k < kEnd) { desc(k).buf = null; desc(k).pos = 0; k += 1 }
      }
      if (tnum < 0) throw new Tok3Exception("tok3: stream before first token")

      // implicit TYPE stream: first block of a token with nonzero type
      // means every name uses that type (first) then MATCH (rest)
      if ((ttype & 15) != 0 && (ttype & 128) != 0) {
        val t = new Array[Byte](nreads)
        if (nreads > 0) {
          t(0) = (ttype & 15).toByte
          java.util.Arrays.fill(t, 1, nreads, N_MATCH.toByte)
        }
        desc(tnum << 4).buf = t
        desc(tnum << 4).pos = 0
      }

      val i = (tnum << 4) | (ttype & 15)

      if ((ttype & 64) != 0) { // duplicate of an earlier stream
        if (o + 2 > in.length) throw new Tok3Exception("tok3: truncated dup descriptor")
        val j = ((in(o) & 0xff) << 4) + (in(o + 1) & 0xff); o += 2
        if (j >= i || desc(j).buf == null)
          throw new Tok3Exception("tok3: dup of a non-existent stream")
        desc(i).buf = desc(j).buf.clone()
        desc(i).pos = 0
      } else { // entropy-coded payload
        val expected = peekUlen(in, o, in.length)
        val (clen, nb) = varU32(in, o, in.length)
        // corrupt varints can wrap negative: a negative clen would walk
        // the descriptor cursor backwards (infinite loop), a huge
        // expected would OOM before the post-decode length check
        if (clen < 0 || clen > in.length - o)
          throw new Tok3Exception(s"tok3: stream length $clen overruns input")
        if (expected < 0 || expected > (1 << 28))
          throw new Tok3Exception(s"tok3: implausible stream size $expected")
        val data =
          if (useArith) ArithDynamic.decode(in, o + nb, in.length - (o + nb), -1)
          else RansNx16.decode(in, o + nb, in.length - (o + nb), -1)
        if (data.length != expected)
          throw new Tok3Exception(
            s"tok3: stream $i decoded ${data.length} bytes, expected $expected")
        desc(i).buf = data
        desc(i).pos = 0
        o += nb + clen
      }
    }

    // decode names against the rolling last-name context
    val out = new java.io.ByteArrayOutputStream(math.max(ulen, 64))
    val names = new Array[Array[Byte]](nreads)
    val toks = new Array[Array[Tok]](nreads)
    val ntoks = new Array[Int](nreads)

    val name = new java.io.ByteArrayOutputStream(256)
    var cnum = 0
    val typeStream = desc(0)
    while (cnum < nreads && typeStream.remaining > 0) {
      val t0 = typeStream.nextByte()
      val dist = desc(t0).nextU32()
      if (Integer.compareUnsigned(dist, cnum) > 0)
        throw new Tok3Exception("tok3: name reference before start of block")
      val pnum = math.max(cnum - dist, 0)

      if (t0 == N_DUP) {
        if (pnum == cnum) throw new Tok3Exception("tok3: self-referential DUP")
        names(cnum) = names(pnum)
        toks(cnum) = toks(pnum)
        ntoks(cnum) = ntoks(pnum)
        out.write(names(cnum)); out.write(0)
      } else {
        name.reset()
        val cur = new Array[Tok](MAX_TOKENS)
        val prev = if (pnum != cnum) toks(pnum) else null
        val prevN = if (pnum != cnum) ntoks(pnum) else 0
        var ntok = 1
        var done = false
        while (!done) {
          if (ntok >= MAX_TOKENS || ntok >= maxTok)
            throw new Tok3Exception("tok3: name lacked an END token")
          val d = desc(ntok << 4)
          val tok = d.nextByte()
          val t = new Tok
          cur(ntok) = t
          tok match {
            case N_CHAR =>
              val c = desc((ntok << 4) | N_CHAR).nextByte()
              t.ttype = N_CHAR; t.ival = c
              name.write(c)
            case N_ALPHA =>
              val s = desc((ntok << 4) | N_ALPHA).nextAlpha()
              t.ttype = N_ALPHA; t.alpha = s; t.ival = s.length
              name.write(s, 0, s.length)
            case N_DIGITS0 =>
              val vl = desc((ntok << 4) | N_DZLEN).nextByte()
              val v = desc((ntok << 4) | N_DIGITS0).nextU32()
              t.ttype = N_DIGITS0; t.ival = v; t.width = vl
              appendFixed(name, v, vl)
            case N_DDELTA0 =>
              if (prev == null || ntok >= prevN)
                throw new Tok3Exception("tok3: DDELTA0 without previous token")
              val dv = desc((ntok << 4) | N_DDELTA0).nextByte()
              val v = prev(ntok).ival + dv
              t.ttype = N_DIGITS0; t.ival = v; t.width = prev(ntok).width
              appendFixed(name, v, t.width)
            case N_DIGITS =>
              val v = desc((ntok << 4) | N_DIGITS).nextU32()
              t.ttype = N_DIGITS; t.ival = v
              appendVar(name, v)
            case N_DDELTA =>
              if (prev == null || ntok >= prevN)
                throw new Tok3Exception("tok3: DDELTA without previous token")
              val dv = desc((ntok << 4) | N_DDELTA).nextByte()
              val v = prev(ntok).ival + dv
              t.ttype = N_DIGITS; t.ival = v
              appendVar(name, v)
            case N_NOP =>
              t.ttype = N_NOP
            case N_MATCH =>
              if (prev == null || ntok >= prevN)
                throw new Tok3Exception("tok3: MATCH without previous token")
              val p = prev(ntok)
              p.ttype match {
                case N_CHAR =>
                  t.ttype = N_CHAR; t.ival = p.ival
                  name.write(p.ival)
                case N_ALPHA =>
                  t.ttype = N_ALPHA; t.alpha = p.alpha; t.ival = p.ival
                  name.write(p.alpha, 0, p.alpha.length)
                case N_DIGITS =>
                  t.ttype = N_DIGITS; t.ival = p.ival
                  appendVar(name, p.ival)
                case N_DIGITS0 =>
                  t.ttype = N_DIGITS0; t.ival = p.ival; t.width = p.width
                  appendFixed(name, p.ival, p.width)
                case other =>
                  throw new Tok3Exception(s"tok3: MATCH against token type $other")
              }
            case _ => // N_END, or any unknown type as an elided END
              t.ttype = N_END
              done = true
          }
          if (!done) ntok += 1
        }
        names(cnum) = name.toByteArray
        toks(cnum) = cur
        ntoks(cnum) = ntok
        out.write(names(cnum)); out.write(0)
      }
      cnum += 1
    }

    out.toByteArray
  }

  /** Decimal with exactly `width` characters (leading zeros kept). */
  private def appendFixed(out: java.io.ByteArrayOutputStream, v: Int, width: Int): Unit = {
    var i = java.lang.Integer.toUnsignedLong(v)
    var w = math.min(width, 9)
    var div = 1L
    var k = 1
    while (k < w) { div *= 10; k += 1 }
    while (w > 0) {
      out.write(('0' + (i / div)).toInt & 0xff)
      i %= div
      div /= 10
      w -= 1
    }
  }

  /** Decimal without leading zeros; value 0 appends nothing, matching
    * the format (a zero can only be a DIGITS0 token). */
  private def appendVar(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    val i = java.lang.Integer.toUnsignedLong(v)
    if (i != 0) {
      val s = java.lang.Long.toString(i)
      var k = 0
      while (k < s.length) { out.write(s.charAt(k)); k += 1 }
    }
  }
}
