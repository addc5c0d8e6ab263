package graft.ops

import graft.kernel.TextKernel
import org.apache.spark.sql.DataFrame
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
  * Scale design: training is two wordcount aggregates (unigrams,
  * bigrams) over the reference slice — map-side partial combine, one
  * hash shuffle each; N and V ride in one broadcast 1-row aggregate,
  * never a collect. Scoring is JOIN-shaped, not broadcast-model-shaped:
  * corpus transitions left-join the bigram table on (prev, w) and the
  * unigram table on each side. At 100 TB the bigram table is itself
  * huge (it grows with the reference), so a shuffled hash join on the
  * token keys is the right default; the unigram/vocab table is small
  * relative to the corpus (natural-language vocab) and AQE demotes
  * those joins to broadcasts on its own. Hot tokens ("the") skew the
  * probe side only — the build side holds one row per key, and AQE's
  * skew-join splitting handles the probe fan-in. Nothing is all-pairs;
  * no model state touches the driver.
  */
object LmScore {

  private val tokensUdf = udf((text: String) => TextKernel.tokens(text))

  /** (prev, w) transition pairs of a document, in one kernel pass. */
  private val transitionsUdf = udf((text: String) => {
    val t = TextKernel.tokens(text)
    if (t.length < 2) Array.empty[(String, String)]
    else Array.tabulate(t.length - 1)(i => (t(i), t(i + 1)))
  })

  /** Per-document Stupid-Backoff average log10 probability, scored
    * against a bigram LM trained on `refDocs`. Output:
    * (doc_id, n_trans, avg_logprob).
    */
  def scoreStupidBackoff(
      docs: DataFrame,
      refDocs: DataFrame,
      idCol: String,
      textCol: String,
      alpha: Double = 0.4): DataFrame = {
    val trans = docs.select(col(idCol).as("doc_id"),
        explode(transitionsUdf(col(textCol))).as("tr"))
      .select(col("doc_id"), col("tr._1").as("prev"), col("tr._2").as("w"))
    val uni = refDocs
      .select(explode(tokensUdf(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
    // N (corpus tokens) + V (vocab) in ONE 1-row aggregate reused by
    // every scored row via a broadcast nested loop — no collect.
    val stats = uni.agg(sum(col("c1")).as("n_tokens"),
      count(lit(1)).as("vocab"))
    val big = refDocs
      .select(explode(transitionsUdf(col(textCol))).as("tr"))
      .groupBy(col("tr._1").as("prev"), col("tr._2").as("w"))
      .agg(count(lit(1)).as("c2"))
    // a bigram seen in the reference implies prev is in the unigram
    // table, so the seen-branch denominator is never NULL
    trans
      .join(big, Seq("prev", "w"), "left")
      .join(uni.select(col("w").as("prev"), col("c1").as("c1_prev")),
        Seq("prev"), "left")
      .join(uni.select(col("w"), col("c1").as("c1_w")), Seq("w"), "left")
      .crossJoin(broadcast(stats))
      .withColumn("logp",
        when(col("c2").isNotNull,
          log10(col("c2").cast("double") / col("c1_prev")))
        .otherwise(log10(
          lit(alpha) * (coalesce(col("c1_w"), lit(0L)) + lit(1L)).cast("double")
            / (col("n_tokens") + col("vocab")))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trans"), avg(col("logp")).as("avg_logprob"))
  }
}
