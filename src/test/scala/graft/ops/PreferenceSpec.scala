package graft.ops

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

class PreferenceSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def pairs(rows: Seq[(Long, Long, Long)], minMargin: Long) = {
    import spark.implicits._
    Preference.preferencePairs(
        rows.toDF("prompt_id", "doc_id", "score"),
        "prompt_id", "doc_id", "score", minMargin)
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
  }

  test("hand-computed best-vs-worst pairs with margin filter") {
    val got = pairs(Seq(
      (1L, 101L, 500L), (1L, 102L, 300L), (1L, 103L, 700L),
      (2L, 201L, 100L), // single candidate: dropped
      (3L, 301L, 200L), (3L, 302L, 200L), // all tied: margin 0, dropped
      (4L, 401L, -500L), (4L, 402L, -100L)), minMargin = 1L)
    assert(got == Seq(
      (1L, 3L, 103L, 700L, 102L, 300L, 400L),
      (4L, 2L, 402L, -100L, 401L, -500L, 400L)))
  }

  test("margin 0 keeps tied groups with deterministic id tie-break") {
    val got = pairs(Seq((3L, 301L, 200L), (3L, 302L, 200L)), minMargin = 0L)
    // tie on score: chosen = larger id, rejected = smaller (rank fold)
    assert(got == Seq((3L, 2L, 302L, 200L, 301L, 200L, 0L)))
  }

  test("chosen/rejected agree with max/min among several ties") {
    val got = pairs(Seq(
      (7L, 1L, 9L), (7L, 2L, 9L), (7L, 3L, 4L), (7L, 4L, 4L)),
      minMargin = 5L)
    assert(got == Seq((7L, 4L, 2L, 9L, 3L, 4L, 5L)))
  }

  test("contract violations fail loudly instead of corrupting pairs") {
    // id >= 10^7 would bleed into the score component of the rank fold
    val e1 = intercept[Exception](
      pairs(Seq((1L, 10000000L, 5L), (1L, 2L, 3L)), minMargin = 0L))
    assert(e1.getMessage.contains("out of [0, 10^7)"),
      s"unexpected: ${e1.getMessage}")
    // negative ids equally break the fold
    val e2 = intercept[Exception](
      pairs(Seq((1L, -1L, 5L), (1L, 2L, 3L)), minMargin = 0L))
    assert(e2.getMessage.contains("out of [0, 10^7)"))
    // |score| >= 9e11 overflows score * 10^7 in a long
    val e3 = intercept[Exception](
      pairs(Seq((1L, 1L, 900000000000L), (1L, 2L, 3L)), minMargin = 0L))
    assert(e3.getMessage.contains("overflows"))
  }
}
