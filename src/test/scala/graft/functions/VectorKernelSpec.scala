package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the integer vector kernels behind k-means and
  * JL projection: checked against naive references, plus the
  * linearity the signed projection must preserve (it is what makes
  * JL distance-preserving in expectation).
  */
class VectorKernelSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val vecGen = for {
    n <- Gen.choose(1, 32)
    v <- Gen.listOfN(n, Gen.choose(-1000L, 1000L))
  } yield v.toArray

  private def ad(a: Array[Long]) = new GenericArrayData(a)

  test("sqDistLong equals the naive sum of squared diffs") {
    for (a <- samples(vecGen, 200)) {
      val b = a.map(x => -x + 7)
      val got = VectorCodegen.sqDistLong(ad(a), ad(b))
      val expect = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      assert(got == expect)
    }
  }

  test("assignMin picks the true argmin with lowest-cid ties") {
    for (q <- samples(vecGen, 100)) {
      val cents = Array(
        q.map(_ + 3), q.map(x => x), q.map(_ - 2), q.map(x => x))
      val cids = Array(5L, 9L, 11L, 20L)
      val r = VectorCodegen.assignMin(ad(q), cents, cids)
      // exact duplicates of q at cids 9 and 20 → dist 0, tie → 9
      assert(r(0) == 0L && r(1) == 9L)
    }
  }

  test("projectSigned is linear: P(a + b) = P(a) + P(b)") {
    val signs = Array.tabulate(8, 16)((j, i) =>
      graft.ops.Clustering.projSign(i, j))
    for (a <- samples(Gen.listOfN(16, Gen.choose(-500L, 500L)).map(_.toArray), 100)) {
      val b = a.map(x => x * 2 - 13)
      val pa = VectorCodegen.projectSigned(ad(a), signs)
      val pb = VectorCodegen.projectSigned(ad(b), signs)
      val pab = VectorCodegen.projectSigned(
        ad(a.zip(b).map { case (x, y) => x + y }), signs)
      assert(pab.toSeq == pa.zip(pb).map { case (x, y) => x + y }.toSeq)
    }
  }

  test("kernels return null on length mismatch") {
    assert(VectorCodegen.sqDistLong(ad(Array(1L)), ad(Array(1L, 2L))) == null)
    assert(VectorCodegen.assignMin(ad(Array(1L)),
      Array(Array(1L, 2L)), Array(0L)) == null)
    assert(VectorCodegen.projectSigned(ad(Array(1L)),
      Array(Array(1L, 2L))) == null)
  }
}
