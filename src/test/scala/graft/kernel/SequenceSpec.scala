package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Semantics per reference src/sequence_functions.cpp tables. */
class SequenceSpec extends AnyFunSuite {
  import Sequence._

  test("DNA reverse complement: basic, case-preserving, IUPAC, gaps") {
    assert(dnaReverseComplement("ACGT") == "ACGT")
    assert(dnaReverseComplement("AAAA") == "TTTT")
    assert(dnaReverseComplement("AcGt") == "aCgT")
    assert(dnaReverseComplement("RYSWKMBDHVN") == "NBDHVKMWSRY")
    assert(dnaReverseComplement("AC-G.T") == "A.C-GT")
    assert(dnaReverseComplement("") == "")
  }

  test("DNA rejects U with 1-based position") {
    val e = intercept[InvalidBaseException](dnaReverseComplement("ACU"))
    assert(e.getMessage.contains("Invalid DNA base 'U' at position 3"))
  }

  test("RNA reverse complement and T rejection") {
    assert(rnaReverseComplement("ACGU") == "ACGU")
    assert(rnaReverseComplement("AAAA") == "UUUU")
    val e = intercept[InvalidBaseException](rnaReverseComplement("ACT"))
    assert(e.getMessage.contains("Invalid RNA base 'T' at position 3"))
  }

  test("DNA as_regexp: IUPAC classes, gaps, case") {
    assert(dnaAsRegexp("ACGT") == "ACGT")
    assert(dnaAsRegexp("N") == "[ACGT]")
    assert(dnaAsRegexp("R") == "[AG]")
    assert(dnaAsRegexp("Y") == "[CT]")
    assert(dnaAsRegexp("B") == "[CGT]")
    assert(dnaAsRegexp("a-c") == "a.c")
    assert(dnaAsRegexp("n") == "[acgt]")
    val e = intercept[InvalidBaseException](dnaAsRegexp("AZ"))
    assert(e.getMessage.contains("Invalid DNA base 'Z' at position 2"))
  }

  test("RNA as_regexp") {
    assert(rnaAsRegexp("ACGU") == "ACGU")
    assert(rnaAsRegexp("N") == "[ACGU]")
    assert(rnaAsRegexp("Y") == "[CU]")
    val e = intercept[InvalidBaseException](rnaAsRegexp("T"))
    assert(e.getMessage.contains("Invalid RNA base 'T' at position 1"))
  }
}
