package graft.kernel

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the excision kernel: random texts and random
  * merged span lists, invariants checked against a naive
  * filter-by-index reference.
  */
class TextExciseSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val tokenGen = Gen.oneOf("Alpha", "beta", "GAMMA", "x1", "Ünïcode", "z")
  private val textGen = for {
    n <- Gen.choose(0, 40)
    ts <- Gen.listOfN(n, tokenGen)
    seps <- Gen.listOfN(n, Gen.oneOf(" ", "  ", "\t", " \n "))
  } yield ts.zip(seps).map { case (t, s) => t + s }.mkString.trim

  /** Random sorted disjoint 1-based ranges within [1, n]. */
  private def rangesGen(n: Int): Gen[Seq[(Int, Int)]] =
    if (n == 0) Gen.const(Seq.empty)
    else for {
      cuts <- Gen.listOf(Gen.choose(1, n))
    } yield {
      val marked = cuts.toSet
      // contiguous runs of marked indexes = merged disjoint ranges
      (1 to n).foldLeft(Vector.empty[(Int, Int)]) { (acc, i) =>
        if (!marked(i)) acc
        else if (acc.nonEmpty && acc.last._2 == i - 1)
          acc.init :+ (acc.last._1 -> i)
        else acc :+ (i -> i)
      }
    }

  test("excision equals the naive keep-filter on 300 random cases") {
    for (text <- samples(textGen, 300)) {
      val raw = text.split(TextKernel.WsPlus).filter(_.nonEmpty)
      for (ranges <- samples(rangesGen(raw.length), 3)) {
        val got = TextKernel.exciseTokenRanges(text,
          ranges.map(_._1).toArray, ranges.map(_._2).toArray)
        if (ranges.isEmpty) assert(got == text)
        else {
          val cut = ranges.flatMap { case (s, e) => s to e }.toSet
          val expect = raw.zipWithIndex
            .collect { case (t, i) if !cut(i + 1) => t }.mkString(" ")
          assert(got == expect, s"text=$text ranges=$ranges")
        }
      }
    }
  }

  test("removed token count equals the span mass") {
    for (text <- samples(textGen, 100)) {
      val raw = text.split(TextKernel.WsPlus).filter(_.nonEmpty)
      for (ranges <- samples(rangesGen(raw.length), 2) if ranges.nonEmpty) {
        val got = TextKernel.exciseTokenRanges(text,
          ranges.map(_._1).toArray, ranges.map(_._2).toArray)
        val kept =
          if (got.isEmpty) 0 else got.split(TextKernel.WsPlus).count(_.nonEmpty)
        val mass = ranges.map { case (s, e) => e - s + 1 }.sum
        assert(kept == raw.length - mass, s"text=$text ranges=$ranges got=$got")
      }
    }
  }
}
