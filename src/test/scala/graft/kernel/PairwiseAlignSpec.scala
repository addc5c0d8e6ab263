package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Cases ported from reference test/cpp/test_WFA2Aligner.cpp. */
class PairwiseAlignSpec extends AnyFunSuite {
  import PairwiseAlign._

  test("penalty validation") {
    assertThrows[IllegalArgumentException](new Aligner(0, 6, 2))
    assertThrows[IllegalArgumentException](new Aligner(-1, 6, 2))
    assertThrows[IllegalArgumentException](new Aligner(4, 6, 0))
    assertThrows[IllegalArgumentException](new Aligner(4, -1, 2))
    new Aligner(4, 0, 2) // gap_open = 0 allowed
  }

  test("align_score basics (defaults 4/6/2)") {
    val a = new Aligner()
    assert(a.alignScore("ACGT", "ACGT") == 0)
    assert(a.alignScore("ACGT", "ACAT") == 4)  // single mismatch
    assert(a.alignScore("ACGGT", "ACGT") == 8) // single insertion: 6+2
    assert(a.alignScore("ACGT", "ACGGT") == 8) // single deletion: 6+2
    assert(new Aligner(2, 6, 2).alignScore("ACGT", "ACAT") == 2)
  }

  test("align_cigar: extended ops") {
    val a = new Aligner()
    assert(a.alignCigar("ACGT", "ACGT") == ((0, "4=")))
    assert(a.alignCigar("ACGT", "ACAT") == ((4, "2=1X1=")))
    assert(a.alignCigar("ACGGT", "ACGT")._2.contains("I"))
    assert(a.alignCigar("ACGT", "ACGGT")._2.contains("D"))
  }

  test("align_full: aligned strings with gap dashes") {
    val a = new Aligner()
    val id = a.alignFull("ACGT", "ACGT")
    assert(id == Full(0, "4=", "ACGT", "ACGT"))
    val mm = a.alignFull("ACGT", "ACAT")
    assert(mm.queryAligned == "ACGT" && mm.subjectAligned == "ACAT")
    val ins = a.alignFull("ACGGT", "ACGT")
    assert(ins.subjectAligned.contains("-"))
    assert(ins.queryAligned.length == ins.subjectAligned.length)
    val del = a.alignFull("ACGT", "ACGGT")
    assert(del.queryAligned.contains("-"))
    assert(del.queryAligned.length == del.subjectAligned.length)
  }

  test("empty sequences") {
    val a = new Aligner()
    assert(a.alignScore("", "") == 0)
    assert(a.alignCigar("", "") == ((0, "")))
    assert(a.alignFull("", "") == Full(0, "", "", ""))
    // one-sided: gap_open + len*gap_extend = 6 + 4*2 = 14
    assert(a.alignScore("ACGT", "") == 14)
    assert(a.alignCigar("ACGT", "") == ((14, "4I")))
    assert(a.alignFull("ACGT", "") == Full(14, "4I", "ACGT", "----"))
    assert(a.alignScore("", "ACGT") == 14)
    assert(a.alignCigar("", "ACGT") == ((14, "4D")))
    assert(a.alignFull("", "ACGT") == Full(14, "4D", "----", "ACGT"))
  }

  test("aligner reuse is stateless") {
    val a = new Aligner()
    assert(a.alignScore("ACGT", "ACGT") == 0)
    assert(a.alignScore("ACGT", "ACAT") == 4)
    assert(a.alignScore("ACGT", "ACGT") == 0)
  }

  test("score consistency: cigar penalties sum to score") {
    val a = new Aligner()
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 50) {
      val q = Seq.fill(5 + rnd.nextInt(30))("ACGT"(rnd.nextInt(4))).mkString
      val s0 = Seq.fill(5 + rnd.nextInt(30))("ACGT"(rnd.nextInt(4))).mkString
      val f = a.alignFull(q, s0)
      // recompute penalty from the aligned strings
      var pen = 0
      var inGapQ = false
      var inGapS = false
      for (k <- f.queryAligned.indices) {
        val (qc, sc) = (f.queryAligned(k), f.subjectAligned(k))
        if (qc == '-') { pen += (if (inGapQ) 2 else 8); inGapQ = true; inGapS = false }
        else if (sc == '-') { pen += (if (inGapS) 2 else 8); inGapS = true; inGapQ = false }
        else { pen += (if (qc == sc) 0 else 4); inGapQ = false; inGapS = false }
      }
      assert(pen == f.score, s"$q vs $s0: cigar=${f.cigar}")
    }
  }
}
