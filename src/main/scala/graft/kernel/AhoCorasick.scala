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
  * The frozen transition tables are per-state SORTED parallel
  * (char[], int[]) arrays probed by binary search: no per-char boxing
  * (a HashMap[Char, Int] transition made the scan no faster than the
  * per-term indexOf loop it exists to beat — and Scala silently
  * unboxes a missing boxed-Int key's null to 0, aliasing every miss
  * to the root state; caught by the l90 oracle), ~1–2 compares for
  * typical 1–2-transition states, and memory O(edges) rather than the
  * O(states × alphabet) of a dense DFA (a 100k-term blocklist stays
  * megabytes).
  */
final class AhoCorasick private (
    val terms: Array[String],
    chars: Array[Array[Char]], // per-state sorted transition chars
    nexts: Array[Array[Int]], // parallel target states
    fail: Array[Int],
    outs: Array[Array[Int]]) extends Serializable {

  private def step(state: Int, c: Char): Int = {
    var s = state
    while (true) {
      val cs = chars(s)
      var lo = 0
      var hi = cs.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val mc = cs(mid)
        if (mc == c) return nexts(s)(mid)
        else if (mc < c) lo = mid + 1
        else hi = mid - 1
      }
      if (s == 0) return 0
      s = fail(s)
    }
    0 // unreachable
  }

  /** Per-term occurrence counts over `text` (all end positions). */
  def countMatches(text: String): Array[Int] = {
    val counts = new Array[Int](terms.length)
    if (text == null) return counts
    var s = 0
    var i = 0
    val n = text.length
    while (i < n) {
      s = step(s, Character.toLowerCase(text.charAt(i)))
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
      new java.util.TreeMap[Character, Integer]())
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
          gotoBuf += new java.util.TreeMap[Character, Integer]()
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
    // freeze: TreeMap iteration is key-sorted → sorted parallel arrays
    val chars = new Array[Array[Char]](nStates)
    val nexts = new Array[Array[Int]](nStates)
    for (s <- 0 until nStates) {
      val m = gotoBuf(s)
      val cs = new Array[Char](m.size)
      val ns = new Array[Int](m.size)
      var i = 0
      m.forEach { (c, t) => cs(i) = c.charValue(); ns(i) = t.intValue(); i += 1 }
      chars(s) = cs
      nexts(s) = ns
    }
    new AhoCorasick(terms, chars, nexts, fail, outBuf.map(_.toArray).toArray)
  }
}
