package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-duplicate validation for the probabilistic (LSH) pipeline
  * operators that the oracle gate can't check.
  */
class LlmOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def plantedDocs = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val words = Vector("spark", "data", "table", "query", "join", "scan",
      "filter", "batch", "window", "hash", "merge", "sort", "row", "column")
    def doc(): String = Seq.fill(40)(words(rnd.nextInt(words.size))).mkString(" ")
    val bases = (0 until 20).map(i => (i.toLong, doc()))
    // plant near-dups: copy of doc i with one word changed, id 100+i
    val dups = (0 until 5).map { i =>
      val t = bases(i)._2.split(" ").toVector.updated(3, "MUTATED").mkString(" ")
      (100L + i, t)
    }
    (bases ++ dups).toDF("doc_id", "text")
  }

  test("minhashPairs finds planted near-duplicates, verified by exact jaccard") {
    val pairs = Dedup.minhashPairs(plantedDocs, "doc_id", "text",
      shingleN = 5, numHashes = 64, bands = 16, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val found = pairs.map(p => (p._1, p._2)).toSet
    for (i <- 0 until 5)
      assert(found.contains((i.toLong, 100L + i)), s"missing planted pair $i")
    // every reported jaccard must actually be >= threshold (verify step works)
    assert(pairs.forall(_._3 >= 0.6))
  }

  test("simhashPairs finds planted near-duplicates") {
    val pairs = Dedup.simhashPairs(plantedDocs, "doc_id", "text", maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = (0 until 5).count(i => pairs.contains((i.toLong, 100L + i)))
    assert(hits >= 4, s"simhash found only $hits/5 planted pairs")
  }

  private def plantedVectors = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def vec(): Array[Float] = Array.fill(16)(rnd.nextGaussian().toFloat)
    val bases = (0 until 40).map(i => (i.toLong, vec()))
    val dups = (0 until 5).map { i =>
      val v = bases(i)._2.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
      (100L + i, v)
    }
    (bases ++ dups).toDF("vec_id", "embedding")
  }

  test("lshNearDupPairs recalls planted near-identical vectors") {
    val pairs = Similarity.lshNearDupPairs(plantedVectors, dim = 16,
      nBits = 8, nTables = 4, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (i <- 0 until 5)
      assert(pairs.contains((i.toLong, 100L + i)), s"missing planted vector pair $i")
  }

  test("bruteForceTopK rank-1 neighbor of a planted dup is its source") {
    val top = Similarity.bruteForceTopK(
      plantedVectors, plantedVectors.filter(col("vec_id") >= 100), 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    for (i <- 0 until 5)
      assert(top(100L + i) == i.toLong)
  }

  test("multimodal feature extraction: byte counts and normalized histogram") {
    val media = Multimodal.mediaFromDocuments(
      plantedDocs.withColumn("n_chars", length(col("text"))))
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.nonEmpty)
    for (r <- feats) {
      assert(r.getAs[Long]("n_bytes") > 0)
      val hist = r.getSeq[Double](4)
      assert(math.abs(hist.sum - 1.0) < 1e-9)
    }
  }
}
