package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (DSIR-style): weight raw
  * corpus documents by how much their hashed-token distribution looks
  * like a small high-quality TARGET set, so sampling by the weight
  * shifts the training mixture toward the target domain (published
  * recipe: hashed n-gram importance resampling; part of the
  * LLM-pipeline extension surface — the reference engine has no
  * counterpart).
  *
  * Determinism contract: instead of the float log-likelihood-ratio
  * (whose ln() last-ulp can differ across libm implementations), the
  * per-feature weight is a QUANTIZED likelihood ratio computed with
  * pure integer arithmetic —
  *   w_milli(f) = least(cap, ((ct+1)·(Nr+D)·1000) div ((cr+1)·(Nt+D)))
  * (add-one smoothing; ct/cr = target/raw occurrence counts, Nt/Nr =
  * total tokens, D = dim) — and the per-document score is the long sum
  * Σ cnt_doc(f)·w_milli(f). Every intermediate is exact in 64 bits
  * while (ct+1)·(Nr+D)·1000 < 2^63 (≈ raw corpora under ~10^6 total
  * tokens per this long form; beyond that switch the two products to
  * decimal(38,0) — the shape is unchanged). The DuckDB oracle
  * re-derives every weight and score exactly.
  *
  * Scale shape: both distribution tables are feature-keyed aggregates
  * whose OUTPUT is ≤ dim rows (features are hashes mod dim), however
  * large the corpora — map-side-combined counts, one reduce each. The
  * dim-row weight table broadcasts into the scoring join; scoring
  * itself is [[QualityClassifier.scoreLinear]]'s shape: map-only
  * per-doc feature extraction, one doc-keyed reduce. Nothing is ever
  * all-pairs or corpus×corpus.
  */
object Dsir {

  /** (doc_id, feature_id, cnt): per-document hashed-unigram counts —
    * tokenize + hash + per-doc count in one kernel pass.
    */
  def featureCounts(docs: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(QualityClassifier.hashedCountsUdf(col(textCol), lit(dim)))
          .as("fc"))
      .select(col("doc_id"), col("fc._1").as("feature_id"),
        col("fc._2").cast("long").as("cnt"))

  /** The dim-row quantized importance-ratio table:
    * (feature_id, ct, cr, w_milli). Features absent from BOTH corpora
    * are absent from the table (they also cannot occur in any scored
    * document drawn from either).
    */
  def importanceWeights(target: DataFrame, raw: DataFrame,
      idCol: String, textCol: String, dim: Int,
      capMilli: Long = 8000L): DataFrame = {
    def totals(df: DataFrame, name: String) =
      featureCounts(df, idCol, textCol, dim)
        .groupBy(col("feature_id")).agg(sum(col("cnt")).as(name))
    val t = totals(target, "ct")
    val r = totals(raw, "cr")
    val joined = t.join(r, Seq("feature_id"), "full_outer")
      .select(col("feature_id"),
        coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
    val sums = joined.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
    joined.crossJoin(broadcast(sums))
      .select(col("feature_id"), col("ct"), col("cr"),
        least(lit(capMilli),
          expr(s"((ct + 1) * (nr + $dim) * 1000) div ((cr + 1) * (nt + $dim))"))
          .as("w_milli"))
  }

  /** Score every document of `docs` against the weight table:
    * (doc_id, n_toks, imp_milli, selected) where imp_milli =
    * Σ cnt(f)·w_milli(f) and selected ⇔ imp_milli ≥
    * perTokThresholdMilli · n_toks (the per-token normalization done
    * by cross-multiplication so selection stays integer-exact).
    * Token-less documents are absent, matching the tokenizer
    * convention repo-wide. Weight features a doc never hits contribute
    * 0 (left join + coalesce).
    */
  def importanceScore(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, dim: Int,
      perTokThresholdMilli: Long = 1000L): DataFrame =
    featureCounts(docs, idCol, textCol, dim)
      .join(broadcast(weights.select(col("feature_id"), col("w_milli"))),
        Seq("feature_id"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_toks"),
        sum(col("cnt") * coalesce(col("w_milli"), lit(0L))).as("imp_milli"))
      .select(col("doc_id"), col("n_toks"), col("imp_milli"),
        (col("imp_milli") >= col("n_toks") * perTokThresholdMilli)
          .as("selected"))
}
