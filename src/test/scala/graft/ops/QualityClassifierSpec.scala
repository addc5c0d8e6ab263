package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private val dim = 64

  test("kernel scoring matches an independent column-expression derivation") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The cat sat on the mat"),
      (2L, "foo foo foo bar"),
      (3L, "unique words only here"),
      (4L, "MiXeD Case TOKENS mixed case tokens"))
      .toDF("doc_id", "text")
    val w = QualityClassifier.formulaWeights(spark, dim)
    val got = QualityClassifier
      .scoreLinear(docs, "doc_id", "text", w, dim)
      .select("doc_id", "n_toks", "z_milli").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq

    // independent path: column-function tokenizer + md5Hash60 feature
    // hash + explicit join + sum — no shared kernel code
    val toks = docs
      .select(col("doc_id"),
        explode(split(lower(col("text")), graft.kernel.TextKernel.Ws + "+")).as("tok"))
      .filter(length(col("tok")) > 0)
    val expected = toks
      .select(col("doc_id"), (Dedup.md5Hash60(col("tok")) % dim).as("feature_id"))
      .join(w, Seq("feature_id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("w_milli")).as("z_milli"))
      .select("doc_id", "n_toks", "z_milli").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq

    assert(got == expected)
    assert(got.map(_._2) == Seq(6L, 4L, 4L, 6L)) // token counts
  }

  test("threshold, bias, kept flag and sigmoid are consistent with z_milli") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val w = QualityClassifier.formulaWeights(spark, dim)
    val base = QualityClassifier.scoreLinear(docs, "doc_id", "text", w, dim)
      .select("z_milli").as[Long].head()
    val shifted = QualityClassifier.scoreLinear(docs, "doc_id", "text", w, dim,
        biasMilli = 500L, thresholdMilli = base + 501L)
      .select("z_milli", "kept", "score").as[(Long, Boolean, Double)].head()
    assert(shifted._1 == base + 500L)
    assert(!shifted._2) // threshold is 1 milli above the shifted score
    val sig = 1.0 / (1.0 + math.exp(-shifted._1.toDouble / 1000.0))
    assert(math.abs(shifted._3 - sig) < 1e-12)
  }

  test("NULL and token-free documents are absent (tokenizer convention)") {
    import spark.implicits._
    val docs = Seq((1L, "real text"), (2L, "   "), (3L, null))
      .toDF("doc_id", "text")
    val w = QualityClassifier.formulaWeights(spark, dim)
    val ids = QualityClassifier.scoreLinear(docs, "doc_id", "text", w, dim)
      .select("doc_id").as[Long].collect().toSeq
    assert(ids == Seq(1L))
  }

  test("batch-GD training separates planted good/bad vocabularies") {
    import spark.implicits._
    // two disjoint vocabularies; labels follow the vocabulary
    val good = Seq("clear", "prose", "helpful", "informative", "cited")
    val bad = Seq("spam", "casino", "clickbait", "viagra", "scam")
    val docs = (0 until 200).map { i =>
      val vocab = if (i % 2 == 0) good else bad
      val words = (0 until 8).map(j => vocab((i + j * 3) % vocab.size))
      (i.toLong, words.mkString(" "), if (i % 2 == 0) 1.0 else 0.0)
    }.toDF("doc_id", "text", "label")
    val dim = 256
    val w = QualityClassifier.trainLogReg(docs, "doc_id", "text", "label",
      dim, iters = 30, lr = 1.0)
    // serve through the EXACT integer path the pipeline uses
    val scored = QualityClassifier.scoreLinear(docs, "doc_id", "text",
      QualityClassifier.toMilliWeights(w), dim, thresholdMilli = 0L)
    val acc = scored.join(docs, Seq("doc_id"))
      .select((col("kept") === (col("label") === 1.0)).cast("int").as("ok"))
      .agg(avg(col("ok"))).as[Double].head()
    assert(acc >= 0.99, s"train accuracy $acc")
  }

  test("weights omitted from the table contribute zero") {
    import spark.implicits._
    val docs = Seq((1L, "aa bb aa")).toDF("doc_id", "text")
    val empty = spark.emptyDataset[(Long, Long)]
      .toDF("feature_id", "w_milli")
    val r = QualityClassifier.scoreLinear(docs, "doc_id", "text", empty, dim)
      .select("n_toks", "z_milli").as[(Long, Long)].head()
    assert(r == ((3L, 0L)))
  }
}
