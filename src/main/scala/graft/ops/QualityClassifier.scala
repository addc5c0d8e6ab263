package graft.ops

import graft.kernel.TextKernel
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Linear quality-classifier inference over hashed bag-of-words
  * features — the fastText/CCNet-style filter that decides which
  * documents enter a pretraining corpus (reference semantics: a
  * per-document keep/drop quality signal like the Gopher rule gate,
  * but model-driven; the reference ships no classifier, this is part
  * of the LLM-pipeline extension surface).
  *
  * Determinism contract: scoring is INTEGER-EXACT. Features are
  * md5-derived 60-bit hashes mod `dim` (the [[graft.ops.Dedup.md5Hash60]]
  * family, bit-for-bit reproducible in any engine with md5), weights
  * are integer milli-units, and the dot product is a long sum — so
  * the DuckDB oracle reproduces z_milli exactly, with no
  * float-summation-order caveat. The float `score` (sigmoid) is
  * derived from the exact integer at the very end, for API users.
  *
  * Scale shape: feature extraction is map-only (tokens, hashes and
  * per-doc counts in ONE kernel pass — no (doc, token) shuffle); the
  * weight table (dim rows) broadcasts; the only exchange is the
  * per-doc partial-sum aggregate (one row per doc per partition,
  * map-side combined). At 100 TB this is a single linear scan plus a
  * doc-keyed reduce. Weight tables too big to broadcast (dim beyond
  * tens of millions) degrade to a shuffled hash join on feature id —
  * still linear in corpus features.
  */
object QualityClassifier {

  /** 60-bit md5 prefix (15 hex chars, big-endian) — identical to
    * `conv(substring(md5(s), 1, 15), 16, 10)` and DuckDB's
    * `CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)`.
    */
  private def md5Fp60(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }

  /** Per-document (feature_id, count) pairs over hashed tokens —
    * tokenize + hash + count in one pass, so the explode below emits
    * per-doc-aggregated features only (vocabulary-bounded per doc,
    * never one row per token).
    */
  private[ops] val hashedCountsUdf = udf((text: String, dim: Int) => {
    if (text == null) Array.empty[(Long, Int)]
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      val m = new java.util.HashMap[java.lang.Long, Int]()
      for (tok <- TextKernel.tokens(text))
        m.merge(md5Fp60(md, tok) % dim, 1, (a, b) => a + b)
      val out = new Array[(Long, Int)](m.size)
      val it = m.entrySet().iterator()
      var k = 0
      while (it.hasNext) {
        val e = it.next()
        out(k) = (e.getKey.longValue, e.getValue)
        k += 1
      }
      out
    }
  })

  /** The deterministic synthetic weight table used by the oracle row
    * and available as a stand-in until a real model is trained:
    * w_milli(f) = ((f % 100003) * 2654435761) % 2001 - 1000, an
    * integer in [-1000, 1000] re-derivable in SQL (all intermediates
    * fit in 64 bits: f % 100003 < 1e5, times the Knuth multiplier
    * ~2.65e9 is < 2.7e14).
    */
  def formulaWeights(spark: SparkSession, dim: Int): DataFrame =
    spark.range(dim).select(col("id").as("feature_id"),
      (((col("id") % 100003L) * 2654435761L) % 2001L - 1000L).as("w_milli"))

  /** Train the classifier with full-batch logistic-regression gradient
    * descent — the distributed-training loop a curation team runs over
    * a labeled quality sample (labels from human raters or a teacher
    * model). Each iteration is ONE aggregate pass over the corpus:
    * per-doc margin via the broadcast weight vector, then a
    * feature-keyed gradient reduce; the k×dim weight state lives on
    * the driver (dim-bounded — the same bounded-collect contract as
    * the IVF centroid table). Deterministic given (data, dim, iters,
    * lr): full-batch gradients are order-insensitive up to float
    * summation, which only perturbs the last ulps of a converged
    * separator — the spec pins planted-vocabulary separation, not
    * bit-exact weights.
    *
    * `labeled` must carry (idCol, textCol, labelCol) with label in
    * {0.0, 1.0}. Returns (feature_id, w) float weights; use
    * [[toMilliWeights]] to freeze them for exact serving.
    */
  def trainLogReg(labeled: DataFrame, idCol: String, textCol: String,
      labelCol: String, dim: Int, iters: Int = 20,
      lr: Double = 0.5): DataFrame = {
    val spark = labeled.sparkSession
    import spark.implicits._
    val feats = labeled
      .select(col(idCol).as("doc_id"), col(labelCol).cast("double").as("y"),
        explode(hashedCountsUdf(col(textCol), lit(dim))).as("fc"))
      .select(col("doc_id"), col("y"), col("fc._1").as("feature_id"),
        col("fc._2").cast("double").as("cnt"))
      .cache()
    val n = math.max(feats.select(col("doc_id")).distinct().count(), 1L)
    var w = Array.fill(dim)(0.0)
    for (_ <- 1 to iters) {
      val wDf = broadcast(
        w.toIndexedSeq.zipWithIndex
          .map { case (v, i) => (i.toLong, v) }.toDF("feature_id", "w"))
      // σ(w·x) − y per doc, then ∂L/∂w_f = Σ_docs err · cnt_f / n
      val grads = feats
        .join(wDf, Seq("feature_id"))
        .groupBy(col("doc_id"), col("y"))
        .agg(sum(col("cnt") * col("w")).as("z"))
        .select(col("doc_id"),
          (lit(1.0) / (lit(1.0) + exp(-col("z"))) - col("y")).as("err"))
        .join(feats, Seq("doc_id"))
        .groupBy(col("feature_id"))
        .agg((sum(col("err") * col("cnt")) / n.toDouble).as("g"))
        .as[(Long, Double)].collect()
      for ((f, g) <- grads) w(f.toInt) -= lr * g
    }
    feats.unpersist()
    w.toIndexedSeq.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("feature_id", "w")
  }

  /** Freeze float weights into the integer milli-unit form
    * [[scoreLinear]] serves exactly.
    */
  def toMilliWeights(weights: DataFrame): DataFrame =
    weights.select(col("feature_id"),
      round(col("w") * 1000.0, 0).cast("long").as("w_milli"))

  /** Score every document: z_milli = bias + Σ count(f) · w_milli(f)
    * over hashed token features, kept = z_milli ≥ threshold, score =
    * sigmoid(z_milli / 1000). `weights` must be (feature_id: long in
    * [0, dim), w_milli: long); rows for features it omits score 0.
    * Output: (doc_id, n_toks, z_milli, kept, score); documents whose
    * text yields no tokens (NULL/empty) are absent, matching the
    * tokenizer's convention everywhere else in the repo.
    */
  def scoreLinear(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, dim: Int,
      biasMilli: Long = 0L, thresholdMilli: Long = 0L): DataFrame = {
    val feats = docs
      .select(col(idCol).as("doc_id"),
        explode(hashedCountsUdf(col(textCol), lit(dim))).as("fc"))
      .select(col("doc_id"), col("fc._1").as("feature_id"),
        col("fc._2").cast("long").as("cnt"))
    // The weight table is ≤ dim rows by contract, so the broadcast
    // decision gates on dim, not on a size estimate: an explicit
    // broadcast() hint is honored unconditionally by Spark (it does
    // NOT fall back for big tables — it OOMs the driver), so only
    // apply it while dim is comfortably driver-sized; above the gate
    // leave the join unhinted and let AQE pick shuffle vs broadcast
    // from the observed build-side size (r8 ADVICE).
    val weightSide =
      if (dim <= 4000000) broadcast(weights) else weights
    feats
      .join(weightSide, Seq("feature_id"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_toks"),
        (sum(col("cnt") * coalesce(col("w_milli"), lit(0L))) + biasMilli)
          .as("z_milli"))
      .select(col("doc_id"), col("n_toks"), col("z_milli"),
        (col("z_milli") >= thresholdMilli).as("kept"),
        (lit(1.0) / (lit(1.0) + exp(-col("z_milli").cast("double") / 1000.0)))
          .as("score"))
  }
}
