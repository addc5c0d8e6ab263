package graft.ops

import graft.kernel.TextKernel
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model quality scoring — the CCNet/Pile-style
  * "perplexity filter": train a cheap bigram LM on a trusted reference
  * slice of the corpus, score every document by its average per-token
  * log-probability, and let the curation pipeline keep the head of the
  * distribution (fluent text scores high; gibberish, boilerplate soup
  * and OCR noise score low). The smoothing is Stupid Backoff (Brants
  * et al. 2007, "Large Language Models in Machine Translation") —
  * the scheme built FOR distributed count-based LMs: no normalization
  * pass, so the model stays two count tables.
  *
  * Score of a transition (prev → w), with counts from the reference:
  *   - bigram seen:  S = c(prev,w) / c(prev)
  *   - else:         S = alpha · (c(w) + 1) / (N + V)
  * (add-one-smoothed unigram backoff; OOV tokens take the same form
  * with c(w)=0, so every transition has a finite log score). Tokens
  * are [[TextKernel.tokens]] (lowercased, WsChars whitespace split) —
  * the same class every oracle re-derives. Documents with fewer than
  * two tokens have no transitions and are absent from the output (the
  * kernel family's documented short-doc convention).
  *
  * Scale design: the model is TABLES, not driver state — training is
  * two wordcount aggregates (unigrams, bigrams) over the reference
  * slice with map-side partial combine; N and V ride in one broadcast
  * 1-row aggregate, never a collect. Scoring is JOIN-shaped: corpus
  * transitions left-join the bigram and unigram tables on token keys.
  * The model is corpus-independent and usually small (Zipf), so a
  * caller that persists [[BigramModel.cache]] gets AQE-broadcast
  * joins — scoring then runs map-only with one final partial-combined
  * aggregate per doc (transitions of a doc are explode-contiguous, so
  * the partial aggregate collapses them before the shuffle). When the
  * reference slice is so large the bigram table outgrows broadcast,
  * the same plan degrades gracefully to shuffled hash joins on the
  * token keys — still linear, still skew-handled by AQE. Without
  * caching, Catalyst re-derives the model subtree per join (measured
  * 4× re-tokenization of the reference at 500k docs — SCALE.md);
  * the oracle-checked one-shot path accepts that, the throughput
  * path (x07) caches.
  */
object LmScore {

  /** [[TextKernel.tokens]] as a native column expression (same
    * whitespace class, same lowercasing) — codegen'd, no UDF.
    */
  private def toksCol(text: Column): Column = TextCols.toks(text)

  /** (prev, w) transition structs of a document, native form. */
  private def transCol(text: Column): Column = {
    val t = toksCol(text)
    val n1 = greatest(size(t) - 1, lit(0))
    arrays_zip(slice(t, lit(1), n1).as("prev"), slice(t, lit(2), n1).as("w"))
  }

  /** A trained Stupid-Backoff bigram model: `uni` (w, c1), `bigModel`
    * (prev, w, c2, c1_prev — the seen-branch denominator pre-folded,
    * a model-sized join), `stats` (1 row: n_tokens, vocab).
    */
  final case class BigramModel(uni: DataFrame, bigModel: DataFrame,
      stats: DataFrame) {
    /** Persist the model tables (they are model-sized, not
      * corpus-sized) and materialize them so every scoring join sees
      * accurate sizes — AQE then broadcasts what fits. Returns this.
      */
    def cache(): BigramModel = {
      uni.persist(); bigModel.persist(); stats.persist()
      uni.count(); bigModel.count(); stats.count()
      this
    }
    def unpersist(): Unit = {
      uni.unpersist(); bigModel.unpersist(); stats.unpersist()
    }
  }

  /** Train the bigram count tables on the reference slice. */
  def trainStupidBackoff(refDocs: DataFrame, textCol: String): BigramModel = {
    val uni = refDocs
      .select(explode(toksCol(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val stats = uni.agg(sum(col("c1")).as("n_tokens"),
      count(lit(1)).as("vocab"))
    val big = refDocs
      .select(explode(transCol(col(textCol))).as("tr"))
      .groupBy(col("tr.prev").as("prev"), col("tr.w").as("w"))
      .agg(count(lit(1)).as("c2"))
    // a bigram seen in the reference implies prev is in the unigram
    // table, so this inner join loses nothing
    val bigModel = big.join(
      uni.select(col("w").as("prev"), col("c1").as("c1_prev")), "prev")
    BigramModel(uni, bigModel, stats)
  }

  /** Score every document against a trained model. Output:
    * (doc_id, n_trans, avg_logprob).
    */
  def scoreWithModel(docs: DataFrame, model: BigramModel, idCol: String,
      textCol: String, alpha: Double = 0.4): DataFrame = {
    val trans = docs.select(col(idCol).as("doc_id"),
        explode(transCol(col(textCol))).as("tr"))
      .select(col("doc_id"), col("tr.prev").as("prev"), col("tr.w").as("w"))
    trans
      .join(model.bigModel, Seq("prev", "w"), "left")
      .join(model.uni.select(col("w"), col("c1").as("c1_w")), Seq("w"), "left")
      .crossJoin(broadcast(model.stats))
      .withColumn("logp",
        when(col("c2").isNotNull,
          log10(col("c2").cast("double") / col("c1_prev")))
        .otherwise(log10(
          lit(alpha) * (coalesce(col("c1_w"), lit(0L)) + lit(1L)).cast("double")
            / (col("n_tokens") + col("vocab")))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trans"), avg(col("logp")).as("avg_logprob"))
  }

  /** Broadcast-model kernel scoring — the shape production perplexity
    * filters actually run (CCNet ships its KenLM model file to every
    * worker): the count tables are collected into hash maps,
    * broadcast, and each document is scored in ONE kernel pass —
    * no transition explode, no joins, no final aggregate; wall-time
    * is a single map stage over the corpus (probe at 500k docs:
    * 9.6 s join path → 3.4 s kernel). Only valid when the model fits
    * in executor memory — use [[scoreAuto]] for the size gate.
    * Arithmetic is identical to [[scoreWithModel]] (same IEEE ops per
    * transition; summation order differs only at the 1e-15 level the
    * 6dp compare ignores).
    */
  def scoreWithBroadcastModel(docs: DataFrame, model: BigramModel,
      idCol: String, textCol: String, alpha: Double = 0.4): DataFrame = {
    val uniMap = new java.util.HashMap[String, java.lang.Long]()
    model.uni.collect().foreach(r => uniMap.put(r.getString(0), r.getLong(1)))
    // two-level map (tokens may contain any non-whitespace byte, so no
    // joined-string key): prev -> (w -> (c2, c1_prev))
    val big2 = new java.util.HashMap[String, java.util.HashMap[String, Array[Long]]]()
    model.bigModel.collect().foreach { r =>
      big2.computeIfAbsent(r.getString(0),
        _ => new java.util.HashMap[String, Array[Long]]())
        .put(r.getString(1), Array(r.getLong(2), r.getLong(3)))
    }
    val Array(nTokens, vocab) = {
      val s = model.stats.collect()(0); Array(s.getLong(0), s.getLong(1))
    }
    val sess = docs.sparkSession
    val bcUni = sess.sparkContext.broadcast(uniMap)
    val bcBig = sess.sparkContext.broadcast(big2)
    val denom = (nTokens + vocab).toDouble
    val a = alpha
    val score = udf((text: String) => {
      val t = TextKernel.tokens(text)
      if (t.length < 2) null
      else {
        var sum = 0.0
        var i = 1
        val uni = bcUni.value
        val big = bcBig.value
        while (i < t.length) {
          val inner = big.get(t(i - 1))
          val hit = if (inner == null) null else inner.get(t(i))
          if (hit != null)
            sum += math.log10(hit(0).toDouble / hit(1))
          else {
            val c1w = uni.get(t(i))
            val c1 = if (c1w == null) 0L else c1w.longValue()
            sum += math.log10(a * (c1 + 1L).toDouble / denom)
          }
          i += 1
        }
        (t.length - 1L, sum / (t.length - 1))
      }
    })
    docs.select(col(idCol).as("doc_id"), score(col(textCol)).as("r"))
      .filter(col("r").isNotNull)
      .select(col("doc_id"), col("r._1").as("n_trans"),
        col("r._2").as("avg_logprob"))
  }

  /** Size-gated scoring (the rype-classify precedent): kernel path
    * when the model is broadcast-safe, join path otherwise. The gate
    * costs two model-sized counts — negligible next to scoring.
    */
  def scoreAuto(docs: DataFrame, model: BigramModel, idCol: String,
      textCol: String, alpha: Double = 0.4,
      maxBroadcastEntries: Long = 4L << 20): DataFrame = {
    if (model.uni.count() + model.bigModel.count() <= maxBroadcastEntries)
      scoreWithBroadcastModel(docs, model, idCol, textCol, alpha)
    else scoreWithModel(docs, model, idCol, textCol, alpha)
  }

  /** One-shot convenience: train on `refDocs`, score `docs`. */
  def scoreStupidBackoff(
      docs: DataFrame,
      refDocs: DataFrame,
      idCol: String,
      textCol: String,
      alpha: Double = 0.4): DataFrame =
    scoreWithModel(docs, trainStupidBackoff(refDocs, textCol),
      idCol, textCol, alpha)
}
