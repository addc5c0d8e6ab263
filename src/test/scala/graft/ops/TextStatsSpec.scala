package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed expectations for the round-5 curation signals
  * (repetition ratios, PII redaction); the full-corpus semantics are
  * oracle-checked by l18/l19. */
class TextStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("repetitionReport: hand-computed ratios") {
    // "a b a b a" -> bigrams [a b, b a, a b, b a]: top "a b" x2 / 4 = 0.5
    // trigrams [a b a, b a b, a b a]: top x2 / 3
    // 5-grams [a b a b a]: 1 distinct / 1 -> dup 0.0
    val df = Seq((1L, "a b a b a"), (2L, "x y"), (3L, "")).toDF("doc_id", "text")
    val r = TextStats.repetitionReport(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 5L)
    assert(r(0).getDouble(2) == 0.5)
    assert(math.abs(r(0).getDouble(3) - 2.0 / 3) < 1e-6)
    assert(r(0).getDouble(4) == 0.0)
    // 2 words: one bigram (ratio 1.0), no trigrams/5-grams
    assert(r(1).getLong(1) == 2L && r(1).getDouble(2) == 1.0
      && r(1).getDouble(3) == 0.0 && r(1).getDouble(4) == 0.0)
    // empty text: all zeros
    assert(r(2).getLong(1) == 0L && r(2).getDouble(2) == 0.0)
  }

  test("repetitionReport: fully repeated text maxes dup ratio") {
    val df = Seq((1L, Array.fill(20)("spam").mkString(" "))).toDF("doc_id", "text")
    val r = TextStats.repetitionReport(df, "doc_id", "text").head()
    assert(r.getDouble(2) == 1.0) // every bigram is "spam spam"
    assert(r.getDouble(4) == 1.0 - 1.0 / 16) // 16 5-grams, 1 distinct
  }

  test("redactPii replaces emails, IPs, phones") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      "mail a.b+c@x-corp.io here",
      "server 192.168.0.1 up",
      "call 555-123-4567 now",
      "all three: u@d.co 10.0.0.1 555-000-1111",
      "none here, 1.2.3 not an ip, 12-34-56 not a phone"
    ).toDF("t").select(TextStats.redactPii(col("t")).as("r"))
    val r = df.collect().map(_.getString(0))
    assert(r(0) == "mail <EMAIL> here")
    assert(r(1) == "server <IP> up")
    assert(r(2) == "call <PHONE> now")
    assert(r(3) == "all three: <EMAIL> <IP> <PHONE>")
    assert(r(4) == "none here, 1.2.3 not an ip, 12-34-56 not a phone")
  }

  test("luhnValid: known-good PANs pass, off-by-one check digits fail") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      "4539578763621486" -> true,  // standard 16-digit Visa test number
      "4539578763621487" -> false, // same, check digit bumped
      "79927398713" -> true,       // the classic Luhn example (11 digits)
      "79927398710" -> false,
      "0000000000000000" -> true,  // sum 0 ≡ 0 — leading zeros fine
      "378282246310005" -> true    // 15-digit Amex test number
    )
    val got = cases.map(_._1).toDF("n")
      .select(col("n"), TextStats.luhnValid(col("n")).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    for ((n, expect) <- cases)
      assert(got(n) == expect, s"$n expected $expect")
  }

  test("charEntropy: uniform, degenerate, empty, and supplementary-plane cases") {
    import spark.implicits._
    val rows = Seq("aabc", "aaaa", "", "ab", "😀😀a")
      .toDF("t").select(TextStats.charEntropy(col("t")))
      .collect().map(_.getDouble(0))
    assert(math.abs(rows(0) - 1.5) < 1e-12) // {a:2,b:1,c:1} → 1.5 bits
    assert(rows(1) == 0.0) // repeated-char spam
    assert(rows(2) == 0.0) // empty text
    assert(math.abs(rows(3) - 1.0) < 1e-12)
    // surrogate pair counted as ONE codepoint: {😀:2, a:1} ≈ 0.918
    assert(math.abs(rows(4) - (-(2.0 / 3) * math.log(2.0 / 3) / math.log(2)
      - (1.0 / 3) * math.log(1.0 / 3) / math.log(2))) < 1e-12)
  }

  test("normalizeText: NFC composition, control strip, whitespace collapse") {
    import spark.implicits._
    val decomposed = "cafe\u0301"   // e + combining acute (NFD spelling)
    val composed = "caf\u00e9"      // precomposed (NFC spelling)
    val rows = Seq(
      (1L, s"  $decomposed\u0007\t\tbarbaz "),
      (2L, "a \t b\nc"), // \n survives; space-tab runs collapse
      (3L, composed))    // already composed: unchanged
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextStats.normalizeText(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(1L) == s"$composed barbaz") // composed, BEL gone, trimmed
    assert(rows(2L) == "a b\nc")
    assert(rows(3L) == composed)
    // NFC makes the two spellings hash-identical (the dedup point)
    assert(rows(1L).startsWith(rows(3L)))
  }
}
