package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral invariants per the documented RYpe semantics
  * (reference: README.md:1879-1960, test/sql/rype_extract.test).
  */
class RypeSpec extends AnyFunSuite {
  import Rype._
  private val seq1 = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"

  test("k/w validation") {
    assertThrows[IllegalArgumentException](validateK(31))
    assertThrows[IllegalArgumentException](validateW(0))
    validateK(16); validateK(32); validateK(64); validateW(1)
  }

  test("sequences shorter than k yield empty sets") {
    assert(minimizerSet("ACGT", 16, 5, DefaultSalt).isEmpty)
    assert(strandMinimizers("", 16, 5, DefaultSalt)._1.isEmpty)
  }

  test("deterministic; salt changes selection") {
    val a = minimizerSet(seq1, 16, 5, DefaultSalt)
    val b = minimizerSet(seq1, 16, 5, DefaultSalt)
    val c = minimizerSet(seq1, 16, 5, 42L)
    assert(a.sameElements(b))
    assert(a.nonEmpty)
    assert(!a.sameElements(c))
  }

  test("set is unsigned-sorted and distinct") {
    val s = minimizerSet(seq1, 16, 3, DefaultSalt)
    assert(s.distinct.length == s.length)
    assert(s.sliding(2).forall {
      case Array(x, y) => java.lang.Long.compareUnsigned(x, y) < 0
      case _           => true
    })
  }

  test("rc_set(seq) == fwd_set(revcomp(seq))") {
    for (s <- Seq(seq1, "GGGGCCCCGGGGCCCCGGGGCCCCGGGGCCCCGGGG")) {
      val (_, rc) = extractMinimizerSet(s, 16, 5, DefaultSalt)
      val fwdOfRc = minimizerSet(reverseComplementLenient(s), 16, 5, DefaultSalt)
      assert(rc.sameElements(fwdOfRc))
    }
  }

  test("strand variant: len(hashes)==len(positions), 0-based bounds") {
    val (h, p) = strandMinimizers(seq1, 16, 5, DefaultSalt)
    assert(h.length == p.length && h.nonEmpty)
    assert(p.forall(x => x >= 0 && x <= seq1.length - 16))
    // positions strictly increasing (window scan order)
    assert(p.sliding(2).forall { case Array(a, b) => a < b; case _ => true })
  }

  test("ambiguous bases break k-mer runs") {
    val clean = minimizerSet(seq1, 16, 5, DefaultSalt)
    val withN = minimizerSet(seq1.updated(20, 'N'), 16, 5, DefaultSalt)
    assert(withN.nonEmpty && !withN.sameElements(clean))
    // an all-N sequence yields nothing
    assert(minimizerSet("N" * 60, 16, 5, DefaultSalt).isEmpty)
  }

  test("similar sequences share minimizers; dissimilar share few") {
    val a = minimizerSet(seq1, 16, 5, DefaultSalt).toSet
    val mutated = seq1.updated(10, 'G').updated(30, 'C')
    val b = minimizerSet(mutated, 16, 5, DefaultSalt).toSet
    val unrelated = minimizerSet("GGGGCCCCGGGGCCCCGGGGCCCCGGGGCCCCGGGGCCCCGGGG", 16, 5, DefaultSalt).toSet
    assert(a.intersect(b).size > a.intersect(unrelated).size)
  }

  test("score: overlap fraction of the query set") {
    val q = Array(1L, 2L, 3L, 4L)
    assert(score(q, Set(1L, 2L)) == 0.5)
    assert(score(q, Set.empty[Long]) == 0.0)
    assert(score(Array.empty[Long], Set(1L)) == 0.0)
  }
}
