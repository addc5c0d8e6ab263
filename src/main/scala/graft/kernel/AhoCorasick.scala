package graft.kernel

/** Aho–Corasick multi-pattern matcher: one O(|text|) scan finds every
  * occurrence of every term — the curation-scale replacement for
  * per-term regex passes (a blocklist of thousands of terms scanned
  * per document would otherwise cost O(|terms| · |text|)). Classic
  * construction from the 1975 paper: goto trie + BFS failure links +
  * output sets merged through the failure chain.
  *
  * Matching is case-insensitive on the Char level (terms and text are
  * lowercased); all end positions are reported, so a term that
  * self-overlaps ("aa" in "aaa") counts every occurrence — callers
  * needing non-overlapping counts (the SQL `replace`-based oracle
  * convention) should use borderless terms or dedup positions.
  *
  * The goto maps are BOXED (`Character → Integer`) on purpose: with
  * `HashMap[Char, Int]` Scala auto-unboxes a missing key's null to 0
  * — every miss silently aliased the root state and the trie never
  * grew (caught by the l90 oracle on first contact).
  */
final class AhoCorasick private (
    val terms: Array[String],
    gotoMap: Array[java.util.HashMap[Character, Integer]],
    fail: Array[Int],
    outs: Array[Array[Int]]) extends Serializable {

  /** Per-term occurrence counts over `text` (all end positions). */
  def countMatches(text: String): Array[Int] = {
    val counts = new Array[Int](terms.length)
    if (text == null) return counts
    var s = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = Character.valueOf(Character.toLowerCase(text.charAt(i)))
      var nxt = gotoMap(s).get(c)
      while (nxt == null && s != 0) {
        s = fail(s)
        nxt = gotoMap(s).get(c)
      }
      s = if (nxt == null) 0 else nxt.intValue()
      val o = outs(s)
      var j = 0
      while (j < o.length) { counts(o(j)) += 1; j += 1 }
      i += 1
    }
    counts
  }
}

object AhoCorasick {

  /** Build the automaton (lowercased terms; empty/null terms dropped,
    * duplicates collapse onto one index — the first occurrence).
    */
  def build(rawTerms: Seq[String]): AhoCorasick = {
    val terms = rawTerms.iterator.filter(t => t != null && t.nonEmpty)
      .map(_.toLowerCase).distinct.toArray
    val gotoBuf = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val outBuf = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    // goto trie
    for ((t, ti) <- terms.zipWithIndex) {
      var s = 0
      for (ch <- t) {
        val c = Character.valueOf(ch)
        val nxt = gotoBuf(s).get(c)
        s = if (nxt != null) nxt.intValue()
        else {
          gotoBuf += new java.util.HashMap[Character, Integer]()
          outBuf += scala.collection.mutable.ArrayBuffer.empty[Int]
          gotoBuf(s).put(c, Integer.valueOf(gotoBuf.length - 1))
          gotoBuf.length - 1
        }
      }
      outBuf(s) += ti
    }
    // BFS failure links; merge outputs through the fail chain
    val nStates = gotoBuf.length
    val fail = new Array[Int](nStates)
    val queue = new java.util.ArrayDeque[Integer]()
    gotoBuf(0).forEach((_, v) => { fail(v.intValue()) = 0; queue.add(v) })
    while (!queue.isEmpty) {
      val s = queue.poll().intValue()
      gotoBuf(s).forEach { (c, tBox) =>
        val t = tBox.intValue()
        queue.add(tBox)
        var f = fail(s)
        var nxt = gotoBuf(f).get(c)
        while (nxt == null && f != 0) {
          f = fail(f)
          nxt = gotoBuf(f).get(c)
        }
        fail(t) = if (nxt == null || nxt.intValue() == t) 0 else nxt.intValue()
        outBuf(t) ++= outBuf(fail(t))
      }
    }
    new AhoCorasick(terms, gotoBuf.toArray, fail, outBuf.map(_.toArray).toArray)
  }
}
