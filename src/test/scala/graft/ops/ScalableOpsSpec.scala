package graft.ops

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

class ScalableOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def sides = {
    import spark.implicits._
    // left: (event_id, key, t, value); right: (key, rt, tag)
    val lhs = Seq(
      (1L, "a", 10L, 1.5), // before any right row -> null payload
      (2L, "a", 20L, 2.5), // exactly at rt=20 -> matches (>= semantics)
      (3L, "a", 35L, 3.5), // after rt=20 and rt=30 -> latest (30) wins
      (4L, "b", 50L, 4.5), // key with no right rows at all
      (5L, "c", 15L, 5.5) // right rows exist but all later -> null
    ).toDF("event_id", "key", "t", "value")
    val rhs = Seq(
      ("a", 20L, "r20"), ("a", 30L, "r30"),
      ("c", 99L, "r99")
    ).toDF("key", "rt", "tag")
    (lhs, rhs)
  }

  test("asof backward: latest at-or-before right row per key; unmatched stay null") {
    val (lhs, rhs) = sides
    val out = ScalableOps.asofJoinBackward(lhs, rhs, Seq("key"), "t", "rt")
      .collect().map(r => r.getLong(0) -> Option(r.getString(4))).toMap
    assert(out == Map(
      1L -> None, 2L -> Some("r20"), 3L -> Some("r30"),
      4L -> None, 5L -> None))
  }

  test("asof backward: output keeps every left row exactly once and all left columns") {
    val (lhs, rhs) = sides
    val out = ScalableOps.asofJoinBackward(lhs, rhs, Seq("key"), "t", "rt")
    assert(out.count() == lhs.count())
    assert(out.columns.toSeq == Seq("event_id", "key", "t", "value", "tag"))
    // left values ride through untouched
    val v = out.collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(v(3L) == 3.5 && v(4L) == 4.5)
  }

  test("asof backward: one exchange only (union/carry-forward, no range probe)") {
    val (lhs, rhs) = sides
    val plan = ScalableOps.asofJoinBackward(lhs, rhs, Seq("key"), "t", "rt")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly one key exchange:\n$plan")
    assert(!plan.contains("Join"), s"no join operator expected:\n$plan")
  }

  test("asof forward: earliest at-or-after right row per key; unmatched stay null") {
    val (lhs, rhs) = sides
    val out = ScalableOps.asofJoinForward(lhs, rhs, Seq("key"), "t", "rt")
      .collect().map(r => r.getLong(0) -> Option(r.getString(4))).toMap
    assert(out == Map(
      1L -> Some("r20"), // before both right rows -> nearest after is 20
      2L -> Some("r20"), // exactly at rt=20 -> matches (<= semantics)
      3L -> None,        // after every right row
      4L -> None,        // key with no right rows
      5L -> Some("r99"))) // later right row now matches forward
  }

  test("asof forward: same single-exchange plan as backward") {
    val (lhs, rhs) = sides
    val plan = ScalableOps.asofJoinForward(lhs, rhs, Seq("key"), "t", "rt")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1)
    assert(!plan.contains("Join"))
  }

  test("range join binned: inclusive bounds, multi-bin intervals, no duplicate pairs") {
    import spark.implicits._
    val pts = Seq(("a", 10L, 1L), ("a", 25L, 2L), ("a", 30L, 3L),
      ("a", 31L, 4L), ("b", 25L, 5L)).toDF("key", "t", "pid")
    // interval [10, 30] spans bins 1..3 at binWidth=10; [100,100] empty-match
    val ivs = Seq(("a", 10L, 30L, 100L), ("b", 100L, 100L, 200L))
      .toDF("key", "s", "e", "iid")
    val out = ScalableOps.rangeJoinBinned(pts, ivs, Seq("key"), "t", "s", "e", 10L)
      .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // both bounds inclusive: t=10 and t=30 match; t=31 does not; key b point
    // is outside its interval; exactly one row per matching pair
    assert(out == Set((100L, 1L), (100L, 2L), (100L, 3L)))
    val n = ScalableOps.rangeJoinBinned(pts, ivs, Seq("key"), "t", "s", "e", 10L).count()
    assert(n == 3L, "pairs must appear exactly once despite multi-bin intervals")
  }

  test("asof backward: colliding payload names are rejected up front") {
    val (lhs, rhs) = sides
    val bad = rhs.withColumnRenamed("tag", "value")
    val e = intercept[IllegalArgumentException] {
      ScalableOps.asofJoinBackward(lhs, bad, Seq("key"), "t", "rt")
    }
    assert(e.getMessage.contains("value"))
  }
}
