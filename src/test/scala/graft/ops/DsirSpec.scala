package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DsirSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  // dim large enough that the 4 distinct test tokens cannot plausibly
  // collide — weights are then per-token and hand-computable
  private val dim = 1 << 20

  test("hand-computed quantized ratio weights") {
    import spark.implicits._
    val target = Seq((1L, "good good great")).toDF("doc_id", "text")
    val raw = target.unionByName(
      Seq((2L, "bad bad bad good spam")).toDF("doc_id", "text"))
    // Nt=3, Nr=8, D=2^20; w = ((ct+1)(Nr+D)1000) div ((cr+1)(Nt+D)):
    //   good  ct=2 cr=3 → 3·1048584000 div 4·1048579 = 750
    //   great ct=1 cr=1 → 2·1048584000 div 2·1048579 = 1000
    //   bad   ct=0 cr=3 → 1·1048584000 div 4·1048579 = 250
    //   spam  ct=0 cr=1 → 1·1048584000 div 2·1048579 = 500
    val w = Dsir.importanceWeights(target, raw, "doc_id", "text", dim)
    val byTok = Seq("good", "great", "bad", "spam")
      .toDF("tok")
      .select(col("tok"), (Dedup.md5Hash60(col("tok")) % dim).as("feature_id"))
      .join(w, Seq("feature_id"))
      .select("tok", "w_milli").as[(String, Long)].collect().toMap
    assert(byTok == Map(
      "good" -> 750L, "great" -> 1000L, "bad" -> 250L, "spam" -> 500L))
  }

  test("scores, per-token selection, and the cap") {
    import spark.implicits._
    val target = Seq((1L, "good good great")).toDF("doc_id", "text")
    val raw = target.unionByName(
      Seq((2L, "bad bad bad good spam")).toDF("doc_id", "text"))
    val w = Dsir.importanceWeights(target, raw, "doc_id", "text", dim)
    val got = Dsir.importanceScore(raw, "doc_id", "text", w, dim,
        perTokThresholdMilli = 600L)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    // doc1: 2·750 + 1000 = 2500 over 3 toks (833/tok ≥ 600: selected)
    // doc2: 3·250 + 750 + 500 = 2000 over 5 toks (400/tok: rejected)
    assert(got == Seq(
      (1L, 3L, 2500L, true),
      (2L, 5L, 2000L, false)))

    val capped = Dsir.importanceWeights(target, raw, "doc_id", "text", dim,
      capMilli = 400L)
    assert(capped.agg(max(col("w_milli"))).head().getLong(0) <= 400L)
  }

  test("unseen-in-target features get the smoothed floor, not zero") {
    import spark.implicits._
    val target = Seq((1L, "alpha")).toDF("doc_id", "text")
    val raw = Seq((1L, "alpha"), (2L, "beta beta")).toDF("doc_id", "text")
    val w = Dsir.importanceWeights(target, raw, "doc_id", "text", dim)
    val betaW = Seq("beta").toDF("tok")
      .select((Dedup.md5Hash60(col("tok")) % dim).as("feature_id"))
      .join(w, Seq("feature_id"))
      .select("w_milli").as[Long].head()
    assert(betaW > 0L && betaW < 1000L)
  }
}
