package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

class AhoCorasickSpec extends AnyFunSuite {

  private def naive(text: String, term: String): Int = {
    val t = text.toLowerCase
    var c = 0
    var i = t.indexOf(term)
    while (i >= 0) { c += 1; i = t.indexOf(term, i + 1) }
    c
  }

  test("classic vectors: the 1975 paper's he/she/his/hers example") {
    val ac = AhoCorasick.build(Seq("he", "she", "his", "hers"))
    assert(ac.countMatches("ushers").toSeq == Seq(1, 1, 0, 1))
    assert(ac.countMatches("his history").toSeq == Seq(0, 0, 2, 0))
    assert(ac.countMatches("zzz").toSeq == Seq(0, 0, 0, 0))
    assert(ac.countMatches("").toSeq == Seq(0, 0, 0, 0))
    assert(ac.countMatches(null).toSeq == Seq(0, 0, 0, 0))
  }

  test("case-insensitive; self-overlapping term counts every end position") {
    val ac = AhoCorasick.build(Seq("AA"))
    assert(ac.countMatches("aAaA").head == 3) // positions 1,2,3
    val ac2 = AhoCorasick.build(Seq("TaBlE"))
    assert(ac2.countMatches("my table TABLE").head == 2)
  }

  test("randomized cross-check against naive indexOf counting") {
    val terms = Seq("table", "spark", "window", "fast", "the", "ab", "bab")
    val ac = AhoCorasick.build(terms)
    val rnd = new scala.util.Random(7)
    val alphabet = "abelprstw "
    for (_ <- 1 to 500) {
      val text = Seq.fill(80)(alphabet(rnd.nextInt(alphabet.length))).mkString
      val got = ac.countMatches(text)
      for ((t, i) <- ac.terms.zipWithIndex)
        assert(got(i) == naive(text, t), s"term=$t text=$text")
    }
  }

  test("duplicate/empty/null terms collapse or drop") {
    val ac = AhoCorasick.build(Seq("x", "X", "", null, "y"))
    assert(ac.terms.toSeq == Seq("x", "y"))
    assert(ac.countMatches("xXy").toSeq == Seq(2, 1))
  }
}
