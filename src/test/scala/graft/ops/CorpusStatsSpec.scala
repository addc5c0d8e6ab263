package graft.ops

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

class CorpusStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "alpha beta gamma delta unique1 one"),
      (2L, "alpha beta gamma delta unique2 two"),
      (3L, "alpha beta gamma delta unique3 three"),
      (4L, "totally different words here now"),
      (5L, "ab") // shorter than n tokens: no grams
    ).toDF("doc_id", "text")
  }

  test("boilerplateNgrams finds grams shared by >= minDocs docs") {
    val rows = CorpusStats.boilerplateNgrams(docs, "doc_id", "text", n = 3, minDocs = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // "alpha beta gamma" and "beta gamma delta" appear in docs 1-3
    assert(rows == Map("alpha beta gamma" -> 3L, "beta gamma delta" -> 3L))
  }

  test("boilerplateRatio computes per-doc saturation; short docs absent") {
    val rows = CorpusStats.boilerplateRatio(docs, "doc_id", "text", n = 3, minDocs = 3)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // each of docs 1-3: 4 distinct trigrams, 2 boilerplate
    for (id <- 1L to 3L) assert(rows(id) == ((4L, 2L, 0.5)), s"doc $id")
    assert(rows(4L) == ((3L, 0L, 0.0))) // no boilerplate
    assert(!rows.contains(5L)) // too short for one trigram window
  }

  test("vocabStats counts totals, doc freq, and corpus fraction") {
    val rows = CorpusStats.vocabStats(docs, "doc_id", "text")
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val corpusTokens = rows.values.map(_._1).sum
    assert(corpusTokens == 24L) // 3 docs x 6 + 5 + 1
    assert(rows("alpha") == ((3L, 3L, 3.0 / corpusTokens)))
    assert(rows("unique1") == ((1L, 1L, 1.0 / corpusTokens)))
    assert(rows("ab")._2 == 1L)
  }

  test("dedupLines removes common lines, keeps order, blanks, empty docs") {
    import spark.implicits._
    val multi = Seq(
      (1L, "COMMON\nkeep one\n\nkeep two\nCOMMON"),
      (2L, "COMMON\nkeep three"),
      (3L, "  COMMON  \nkeep four"), // trimmed form matches COMMON
      (4L, "COMMON") // every line removed → empty clean_text
    ).toDF("doc_id", "text").repartition(4)
    val rows = CorpusStats.dedupLines(multi, "doc_id", "text", minDocs = 3)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    // blank line kept (never counted toward df), order preserved
    assert(rows(1L) == ((5L, 2L, "keep one\n\nkeep two")))
    assert(rows(2L) == ((2L, 1L, "keep three")))
    // removal keys on the TRIMMED form, but kept lines keep raw text
    assert(rows(3L) == ((2L, 1L, "keep four")))
    assert(rows(4L) == ((1L, 1L, "")))
  }

  test("dedupLines below minDocs leaves documents untouched") {
    import spark.implicits._
    val multi = Seq(
      (1L, "a\nb"),
      (2L, "a\nc")
    ).toDF("doc_id", "text")
    val rows = CorpusStats.dedupLines(multi, "doc_id", "text", minDocs = 3)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(rows(1L) == ((2L, 0L, "a\nb")))
    assert(rows(2L) == ((2L, 0L, "a\nc")))
  }

  test("dupChunkFraction flags cross-doc repeated chunks, drops partial tails") {
    import spark.implicits._
    val shared = "one two three four five" // exactly one 5-token chunk
    val corpus = Seq(
      (1L, s"$shared alpha beta gamma delta epsilon tail tail"), // 2 chunks + 2-token tail
      (2L, s"$shared zeta eta theta iota kappa"),
      (3L, "totally different words here now"), // 1 unique chunk
      (4L, "shorty") // < 5 tokens: no chunks, absent
    ).toDF("doc_id", "text").repartition(4)
    val rows = CorpusStats.dupChunkFraction(corpus, "doc_id", "text",
        chunkTokens = 5, minDocs = 2)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(rows(1L) == ((2L, 1L, 0.5))) // shared chunk dup; tail ignored
    assert(rows(2L) == ((2L, 1L, 0.5)))
    assert(rows(3L) == ((1L, 0L, 0.0)))
    assert(!rows.contains(4L))
  }

  test("dupChunkFraction: within-doc repetition alone is not corpus dup") {
    import spark.implicits._
    val rep = "a b c d e"
    val corpus = Seq((1L, s"$rep $rep")).toDF("doc_id", "text")
    val rows = CorpusStats.dupChunkFraction(corpus, "doc_id", "text", 5, 2)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .toMap
    // fp occurs twice but in ONE distinct doc → df=1 < 2, not flagged
    assert(rows(1L) == ((2L, 0L)))
  }

  test("corpusDiff: null text classifies by presence, not by hash nullity") {
    val spark2 = graft.SparkFixture.spark
    import spark2.implicits._
    val prev = Seq((1L, "same"), (2L, null.asInstanceOf[String]),
      (3L, "old"), (4L, "gone")).toDF("doc_id", "text")
    val cur = Seq((1L, "same"), (2L, null.asInstanceOf[String]),
      (3L, null.asInstanceOf[String]), (5L, "fresh")).toDF("doc_id", "text")
    val st = CorpusStats.corpusDiff(prev, cur, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st == Map(
      1L -> "unchanged",
      2L -> "unchanged", // null -> null: present both sides, same (absent) content
      3L -> "changed", // text -> null is a content change, not an add
      4L -> "removed",
      5L -> "added"))
  }

  test("tokenDrift: hand-computed TVD and vocabulary churn") {
    import spark.implicits._
    // prev: tokens {a:2, b:1} (N=3); curr: tokens {a:1, c:2} (N=3)
    val prev = Seq((1L, "a a b")).toDF("doc_id", "text")
    val curr = Seq((1L, "a c c")).toDF("doc_id", "text")
    val r = CorpusStats.tokenDrift(prev, curr, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Double)].head()
    // |p−q|: a |2/3−1/3|=1/3, b |1/3−0|=1/3, c |0−2/3|=2/3 → TVD=2/3
    assert(r._1 == 3L && r._2 == 3L) // totals
    assert(r._3 == 1L) // both: a
    assert(r._4 == 1L) // added: c
    assert(r._5 == 1L) // removed: b
    assert(math.abs(r._6 - 2.0 / 3.0) < 1e-12)
  }

  test("tokenDrift: identical corpora have zero drift") {
    import spark.implicits._
    val docs = Seq((1L, "x y z"), (2L, "x x")).toDF("doc_id", "text")
    val r = CorpusStats.tokenDrift(docs, docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Double)].head()
    assert(r == ((5L, 5L, 3L, 0L, 0L, 0.0)))
  }

  test("exactSubstrSpans finds maximal duplicated spans, incl. within-doc repeats") {
    import spark.implicits._
    val docs = Seq(
      // cross-doc shared 6-token phrase at different offsets
      (1L, "the quick brown fox jumps over pad1 pad2"),
      (2L, "intro the quick brown fox jumps over tail"),
      // within-doc repeat "x y z w": dup windows at 1,2,5,6 → coverage
      // {1..4} ∪ {5..8} is contiguous → ONE maximal span 1-8
      (3L, "x y z w x y z w"),
      (4L, "alpha beta gamma unique words here"),
      (5L, ""),
      (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = CorpusStats.exactSubstrSpans(docs, "doc_id", "text",
        minTokens = 3, minCount = 2)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((1L, 6L, "1-6")))
    assert(got(2L) == ((1L, 6L, "2-7")))
    assert(got(3L) == ((1L, 8L, "1-8")))
    assert(got(4L) == ((0L, 0L, "")))
    assert(got(5L) == ((0L, 0L, "")))
    assert(got(6L) == ((0L, 0L, "")))
  }

  test("exactSubstrSpans keeps disjoint duplicated regions as separate spans") {
    import spark.implicits._
    // "a b c" repeats (docs 1,2) and "p q r" repeats (docs 1,2), with
    // unique separators — two maximal spans in each doc
    val docs = Seq(
      (1L, "a b c sep1 sep2 p q r"),
      (2L, "lead a b c mid1 mid2 mid3 p q r")).toDF("doc_id", "text")
    val got = CorpusStats.exactSubstrSpans(docs, "doc_id", "text",
        minTokens = 3, minCount = 2)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((2L, 6L, "1-3,6-8")))
    assert(got(2L) == ((2L, 6L, "2-4,8-10")))
  }
}
