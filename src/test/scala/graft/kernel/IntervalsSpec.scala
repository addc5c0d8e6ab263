package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Cases ported from reference test/cpp/test_IntervalCompressor.cpp,
  * plus randomized property tests (an upgrade the reference lacks,
  * SURVEY §5).
  */
class IntervalsSpec extends AnyFunSuite {

  private def compress(ivs: (Long, Long)*): Seq[(Long, Long)] = {
    val c = new IntervalCompressor
    ivs.foreach { case (s, e) => c.add(s, e) }
    c.result().toSeq
  }

  test("empty state") {
    val c = new IntervalCompressor
    assert(c.isEmpty && c.size == 0)
  }

  test("single interval") {
    assert(compress((10L, 20L)) == Seq((10L, 20L)))
  }

  test("non-overlapping intervals stay separate") {
    assert(compress((10L, 20L), (100L, 120L), (200L, 220L))
      == Seq((10L, 20L), (100L, 120L), (200L, 220L)))
  }

  test("fully overlapping merge") {
    assert(compress((10L, 300L), (20L, 30L), (50L, 200L)) == Seq((10L, 300L)))
  }

  test("partially overlapping merge") {
    assert(compress((10L, 50L), (40L, 80L), (100L, 150L))
      == Seq((10L, 80L), (100L, 150L)))
  }

  test("touching intervals merge (next.start == cur.stop)") {
    assert(compress((10L, 20L), (20L, 30L), (30L, 40L)) == Seq((10L, 40L)))
  }

  test("unsorted input") {
    assert(compress((200L, 220L), (10L, 20L), (100L, 120L))
      == Seq((10L, 20L), (100L, 120L), (200L, 220L)))
  }

  test("nested intervals") {
    assert(compress((10L, 100L), (20L, 30L), (40L, 50L)) == Seq((10L, 100L)))
  }

  test("inverted input swapped") {
    assert(compress((20L, 10L)) == Seq((10L, 20L)))
  }

  test("merge of two compressors equals merging all inputs") {
    val a = new IntervalCompressor
    a.add(10, 20); a.add(50, 60)
    val b = new IntervalCompressor
    b.add(15, 55); b.add(100, 110)
    a.addAll(b)
    assert(a.result().toSeq == Seq((10L, 60L), (100L, 110L)))
  }

  test("property: output is sorted, non-touching, covers same points") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 100) {
      val ivs = Seq.fill(1 + rnd.nextInt(40)) {
        val s = rnd.nextInt(200).toLong
        (s, s + rnd.nextInt(31))
      }
      val out = compress(ivs: _*)
      // sorted and strictly separated (gap > 0 between merged intervals)
      assert(out.sliding(2).forall {
        case Seq((_, e1), (s2, _)) => s2 > e1
        case _                     => true
      })
      // same covered point set (closed-interval containment semantics)
      def covered(set: Seq[(Long, Long)], p: Long) =
        set.exists { case (s, e) => s <= p && p <= e }
      for (p <- 0L to 240L)
        assert(covered(ivs, p) == covered(out, p))
    }
  }
}
