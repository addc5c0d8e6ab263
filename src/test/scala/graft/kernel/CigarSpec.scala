package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Cases ported from the reference's expectations
  * (reference: test/cpp/test_AlignmentFunctions.cpp).
  */
class CigarSpec extends AnyFunSuite {
  import Cigar._

  test("ParseCigar basic operations") {
    val m = parseCigar("10M")
    assert(m.matches == 10 && m.alignmentColumns == 10 && m.gapOpens == 0)

    val eqx = parseCigar("5=2X3=")
    assert(eqx.matches == 10 && eqx.matchOps == 8 && eqx.mismatchOps == 2
      && eqx.alignmentColumns == 10)

    val ins = parseCigar("10M5I10M")
    assert(ins.matches == 20 && ins.insertions == 5 && ins.alignmentColumns == 25
      && ins.gapOpens == 1)

    val del = parseCigar("10M3D10M")
    assert(del.matches == 20 && del.deletions == 3 && del.alignmentColumns == 23
      && del.gapOpens == 1)

    val both = parseCigar("10M2I5M3D5M")
    assert(both.matches == 20 && both.insertions == 2 && both.deletions == 3
      && both.gapOpens == 2 && both.alignmentColumns == 25)

    // consecutive same-op indels are one gap event
    assert(parseCigar("10M2I3I5M").insertions == 5)
    assert(parseCigar("10M2I3I5M").gapOpens == 1)
    assert(parseCigar("10M2D3D5M").deletions == 5)
    assert(parseCigar("10M2D3D5M").gapOpens == 1)
  }

  test("ParseCigar clipping and skipping") {
    val s = parseCigar("5S10M5S")
    assert(s.matches == 10 && s.softClips == 10 && s.hardClips == 0)
    val h = parseCigar("5H10M5H")
    assert(h.matches == 10 && h.softClips == 0 && h.hardClips == 10)
    val n = parseCigar("10M100N10M")
    assert(n.matches == 20 && n.alignmentColumns == 20)
    val all = parseCigar("10H20S10M2I5M3D5M20S10H")
    assert(all.matches == 20 && all.insertions == 2 && all.deletions == 3
      && all.gapOpens == 2 && all.alignmentColumns == 25
      && all.softClips == 40 && all.hardClips == 20)
    val clipOnlyS = parseCigar("100S")
    assert(clipOnlyS.matches == 0 && clipOnlyS.softClips == 100)
    val clipOnlyH = parseCigar("100H")
    assert(clipOnlyH.matches == 0 && clipOnlyH.hardClips == 100)
  }

  test("ParseCigar edge cases and errors") {
    assert(parseCigar("").matches == 0)
    assert(parseCigar("*").matches == 0)
    assert(parseCigar("150M").matches == 150)
    assertThrows[InvalidCigarException](parseCigar("M"))
    assertThrows[InvalidCigarException](parseCigar("10Z"))
    assertThrows[InvalidCigarException](parseCigar("10M5")) // trailing digits
  }

  test("ParseMd") {
    assert(parseMd("10") == MdStats(10, 0))
    assert(parseMd("5A4") == MdStats(9, 1))
    assert(parseMd("3A2T3") == MdStats(8, 2))
    assert(parseMd("5^AC4") == MdStats(9, 0))
    assert(parseMd("3^A2^TG4") == MdStats(9, 0))
    assert(parseMd("3A2^TG3C1") == MdStats(9, 2))
    assert(parseMd("") == MdStats(0, 0))
    assert(parseMd("0A10") == MdStats(10, 1))
    assert(parseMd("10A0") == MdStats(10, 1))
    assert(parseMd("0A0T0C0") == MdStats(0, 3))
    assert(parseMd("100A50") == MdStats(150, 1))
    assert(parseMd("5AG3") == MdStats(8, 2))
    assert(parseMd("10^ACGTACGT10") == MdStats(20, 0))
    assert(parseMd("5A3^TG2C3") == MdStats(13, 2))
    assert(parseMd("10^AC") == MdStats(10, 0))
    assert(parseMd("^AC^TG") == MdStats(0, 0))
  }

  test("queryLength: htslib-compatible accounting") {
    assert(queryLength("10M", includeHardClips = true) == 10)
    assert(queryLength("5S10M5S", includeHardClips = true) == 20)
    assert(queryLength("5H10M5H", includeHardClips = true) == 20)
    assert(queryLength("5H10M5H", includeHardClips = false) == 10)
    assert(queryLength("10M3D10M", includeHardClips = true) == 20) // D not query-consuming
    assert(queryLength("10M5I10M", includeHardClips = true) == 25)
    assert(queryLength("*", includeHardClips = true) == 0)
    assert(queryLength("", includeHardClips = true) == 0)
  }

  test("queryCoverage: aligned vs mapped") {
    assert(queryCoverage("10M", "aligned") == 1.0)
    assert(queryCoverage("5S10M5S", "aligned") == 0.5)
    assert(queryCoverage("5S10M5I5S", "aligned") == 10.0 / 25.0)
    assert(queryCoverage("5S10M5I5S", "mapped") == 15.0 / 25.0)
    assert(queryCoverage("100S", "aligned") == 0.0)
    assert(queryCoverage("*", "aligned") == 0.0)
    assertThrows[InvalidCigarException](queryCoverage("10M", "bogus"))
  }

  test("seqIdentity: three definitions + NULL semantics") {
    // blast: (aligncols - NM) / aligncols
    assert(seqIdentity("10M", 1, null, "blast").contains(0.9))
    // gap_compressed: (m - nm + g) / (m + o); 10M2I: m=10,g=2,o=1 → (10-3+2)/11
    assert(seqIdentity("10M2I", 3, null, "gap_compressed").contains(9.0 / 11.0))
    // gap_excluded from MD only
    assert(seqIdentity("10M", -1, "8A1", "gap_excluded").contains(9.0 / 10.0))
    // NULL conditions
    assert(seqIdentity("*", 1, "10", "blast").isEmpty)
    assert(seqIdentity("", 1, "10", "blast").isEmpty)
    assert(seqIdentity("10M", -1, null, "blast").isEmpty) // missing NM
    assert(seqIdentity("10M", 11, null, "blast").isEmpty) // NM out of range
    assert(seqIdentity("10M", -1, null, "gap_excluded").isEmpty) // missing MD
    assert(seqIdentity("10M", 15, null, "gap_compressed").isEmpty) // NM > m+g
    assert(seqIdentity("ZZZ", 1, null, "blast").isEmpty) // invalid cigar → NULL
    assertThrows[InvalidCigarException](seqIdentity("10M", 1, null, "bogus"))
  }
}
