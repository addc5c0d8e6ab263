package graft.ops

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

class PackingSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def docs(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, Seq.fill(i % 7)("tok").mkString(" ")))
      .toDF("doc_id", "text")
  }

  test("offsets are a gapless per-bucket concatenation") {
    val rows = Packing.packSequences(docs(50), "doc_id", "text",
        budget = 10, buckets = 4)
      .collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length == 50)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      // sorted by start_offset, each doc starts where the previous ended
      val sorted = rs.sortBy(_._4)
      sorted.foldLeft(0L) { case (expected, (_, id, n, start, pack, off)) =>
        assert(start == expected, s"doc $id")
        assert(pack == start / 10 && off == start % 10, s"doc $id")
        expected + n
      }
    }
  }

  test("zero-token docs keep a defined position; totals conserved") {
    val out = Packing.packSequences(docs(50), "doc_id", "text",
      budget = 10, buckets = 4).collect()
    val zero = out.filter(_.getLong(2) == 0L)
    assert(zero.nonEmpty && zero.forall(r => r.getLong(5) < 10))
    val totalTokens = out.map(_.getLong(2)).sum
    assert(totalTokens == (0 until 50).map(_ % 7).sum)
  }

  test("layout is deterministic and independent of input partitioning") {
    val a = Packing.packSequences(docs(40), "doc_id", "text", 16, 2)
      .collect().map(_.toSeq).toSet
    val b = Packing.packSequences(docs(40).repartition(7), "doc_id", "text", 16, 2)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
