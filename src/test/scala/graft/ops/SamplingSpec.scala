package graft.ops

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def docs = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // big: ~200 docs x ~20 tokens; tiny: 5 docs x 4 tokens
    val big = (0 until 200).map(i =>
      (i.toLong, Seq.fill(15 + rnd.nextInt(10))("w" + rnd.nextInt(50)).mkString(" "), "big"))
    val tiny = (1000 until 1005).map(i =>
      (i.toLong, s"a b c d$i", "tiny"))
    (big ++ tiny).toDF("doc_id", "text", "source")
  }

  test("rate caps at 1.0: an under-budget source keeps every doc") {
    val out = Sampling.tokenBudgetSample(docs, "doc_id", "text", "source",
        budgetTokens = 10000, shares = Map("tiny" -> 0.5, "big" -> 0.1))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // tiny: budget share 5000 tokens >> 20 available -> rate 1.0
    assert(out.count(_._2 == "tiny") == 5)
    // big: 10000*0.1 = 1000 of ~3900 tokens -> roughly a quarter kept
    val kept = out.filter(_._2 == "big").map(_._3).sum.toDouble
    assert(kept > 400 && kept < 1800, s"kept $kept tokens")
  }

  test("membership is deterministic and partitioning-independent") {
    val a = Sampling.tokenBudgetSample(docs, "doc_id", "text", "source",
      8000, Map("big" -> 0.2), defaultShare = 0.5).collect().map(_.getLong(0)).toSet
    val b = Sampling.tokenBudgetSample(docs.repartition(13), "doc_id", "text",
      "source", 8000, Map("big" -> 0.2), defaultShare = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
  }

  test("NULL text counts as 0 tokens, never -1, and never deflates totals") {
    import spark.implicits._
    // 3 NULL-text docs alongside one real doc; without the guard
    // size(NULL)=-1 would subtract 3 from src_tokens and emit -1 rows.
    val withNulls = Seq(
      (1L, "a b c d e", "s"),
      (2L, null: String, "s"),
      (3L, null: String, "s"),
      (4L, null: String, "s")).toDF("doc_id", "text", "source")
    val out = Sampling.tokenBudgetSample(withNulls, "doc_id", "text", "source",
        budgetTokens = 100, shares = Map("s" -> 1.0))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out.values.forall(_ >= 0L), s"negative n_tokens in $out")
    // budget 100 >> 5 available tokens -> rate 1.0, every doc kept
    // (NULL text lands in bucket 0 by the documented convention)
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(1L) == 5L && out(2L) == 0L)
  }

  test("zero default share drops unlisted sources entirely") {
    val out = Sampling.tokenBudgetSample(docs, "doc_id", "text", "source",
      8000, Map("tiny" -> 1.0)).collect()
    assert(out.forall(_.getString(1) == "tiny"))
  }

  test("temperatureMix: rare stratum kept whole, dominant downsampled to ∝√n") {
    import spark.implicits._
    // 900 docs of 'big', 9 of 'rare'. w = (30, 3), W = 33. Budget 200:
    //   rate_big  = min(1, 200·30/33/900) = 0.2020…  → milli 2020
    //   rate_rare = min(1, 200·3/33/9)    = 2.02 → capped 1 → milli 10000
    val docs = ((1 to 900).map(i => (i.toLong, s"big doc $i", "big")) ++
      (1 to 9).map(i => (1000L + i, s"rare doc $i", "rare")))
      .toDF("doc_id", "text", "lang")
    val out = Sampling.temperatureMix(docs, "doc_id", "text", "lang", 200L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byStratum = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byStratum("rare") == 9, s"rare must be kept whole: $byStratum")
    // ~0.202 of 900 ≈ 182 expected; md5 buckets are uniform enough
    // that [120, 250] is a 10-sigma-safe envelope
    assert(byStratum("big") > 120 && byStratum("big") < 250, s"$byStratum")
    // deterministic: a repartitioned rerun keeps the identical rows
    val again = Sampling.temperatureMix(docs.repartition(7),
      "doc_id", "text", "lang", 200L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(again.toSet == out.toSet)
  }

  test("temperatureMix: loud guard at the 500-stratum bound; survives 's' columns") {
    import spark.implicits._
    // 501 distinct strata (key-column misuse) must trip the guard —
    // the thresholds ride as a broadcast literal table, so the bound
    // is deliberately model-sized (r10 verdict #8: 500, not 100k).
    val wide = (1 to 501).map(i => (i.toLong, s"doc $i", s"lang$i"))
      .toDF("doc_id", "text", "lang")
    val e = intercept[IllegalArgumentException] {
      Sampling.temperatureMix(wide, "doc_id", "text", "lang", 100L)
    }
    assert(e.getMessage.contains("500"))
    // exactly 500 strata is allowed
    val atBound = (1 to 500).map(i => (i.toLong, s"doc $i", s"lang${i % 500}"))
      .toDF("doc_id", "text", "lang")
    assert(Sampling.temperatureMix(atBound, "doc_id", "text", "lang",
      1000L).count() > 0)
    // r10 advice: a doc frame carrying columns named s/thr — or the
    // stratum column itself named "s" — must not make the broadcast
    // equi-join ambiguous
    val clash = Seq((1L, "a doc", "en", "x", 9L), (2L, "b doc", "fr", "y", 9L))
      .toDF("doc_id", "text", "s", "thr", "extra")
    val out = Sampling.temperatureMix(clash, "doc_id", "text", "s", 100L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "en"), (2L, "fr")))
  }

  test("temperatureMix drops NULL strata instead of NPEing") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a doc", Some("en")), (2L, "b doc", Some("en")),
      (3L, "c doc", None)).toDF("doc_id", "text", "lang")
    val out = Sampling.temperatureMix(docs, "doc_id", "text", "lang", 100L)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L)) // budget >> n → all non-null kept
  }
}
