package graft.ops

import graft.kernel.TextKernel
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based document curation — the Gopher/C4-style quality gate
  * that decides keep/drop per document and names the first failing
  * rule (the "tagger → mixer" decision record a pipeline audits and
  * tunes). Deliberately built from EXACT-RATIONAL signals only —
  * token counts, single-division ratios — so the decision is
  * bit-reproducible across engines and runs: no entropy/log
  * aggregates whose summation order could flip a threshold.
  *
  * Everything is native column expressions over one `split` (no UDF,
  * fully codegen'd, map-only): at 100 TB this runs at scan speed with
  * column pruning — only (id, text, lang) are read — and composes
  * with any downstream filter pushdown. Rules, in cascade order
  * (first failure wins): too_short, too_long, token_len (mean token
  * length outside [minMeanLen, maxMeanLen]), alpha (alphabetic-token
  * fraction below minAlphaFrac), stopwords (no common function word —
  * Gopher's "symbol soup" guard), lang (metadata language not
  * allowed).
  */
object Curation {

  private def toks(textCol: Column): Column =
    filter(split(lower(textCol), TextKernel.WsPlus), t => t =!= "")

  /** The drop-reason column alone (NULL = keep) — the gate verdict as
    * a pure column expression, reusable where the per-doc signal
    * columns aren't needed (e.g. the streaming pass-rate monitor,
    * which must stay a stateless projection ahead of its windowed
    * aggregate).
    */
  def gopherReason(textCol: Column, langCol: Column,
      minTokens: Int = 50, maxTokens: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      minAlphaFrac: Double = 0.8,
      stopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in"),
      allowedLangs: Seq[String] = Seq("en", "es", "de", "fr")): Column = {
    val t = toks(textCol)
    val n = size(t).cast("long")
    val sumChars = aggregate(transform(t, x => length(x).cast("long")),
      lit(0L), (a, x) => a + x)
    val nAlpha = size(filter(t, x => x.rlike("^[a-z]+$"))).cast("long")
    val meanLen = when(n > 0, sumChars.cast("double") / n)
    val alphaFrac = when(n > 0, nAlpha.cast("double") / n)
    val hasStop = arrays_overlap(t, array(stopwords.map(lit): _*))
    when(n < minTokens, "too_short")
      .when(n > maxTokens, "too_long")
      .when(meanLen < minMeanLen || meanLen > maxMeanLen, "token_len")
      .when(alphaFrac < minAlphaFrac, "alpha")
      .when(!hasStop, "stopwords")
      .when(!langCol.isin(allowedLangs.map(lit(_)): _*), "lang")
  }

  /** Per-document rule evaluation. Output: (doc_id, n_tokens,
    * mean_token_len, alpha_frac, keep, drop_reason) — ratio columns
    * are NULL for token-less documents (which fail too_short anyway).
    */
  def gopherRules(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      minTokens: Int = 50,
      maxTokens: Int = 100000,
      minMeanLen: Double = 3.0,
      maxMeanLen: Double = 10.0,
      minAlphaFrac: Double = 0.8,
      stopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in"),
      allowedLangs: Seq[String] = Seq("en", "es", "de", "fr")): DataFrame = {
    val t = toks(col(textCol))
    val n = size(t).cast("long")
    val sumChars = aggregate(transform(t, x => length(x).cast("long")),
      lit(0L), (a, x) => a + x)
    val nAlpha = size(filter(t, x => x.rlike("^[a-z]+$"))).cast("long")
    val meanLen = when(n > 0, sumChars.cast("double") / n)
    val alphaFrac = when(n > 0, nAlpha.cast("double") / n)
    val reason = gopherReason(col(textCol), col(langCol), minTokens,
      maxTokens, minMeanLen, maxMeanLen, minAlphaFrac, stopwords,
      allowedLangs)
    docs.select(col(idCol).as("doc_id"), n.as("n_tokens"),
      meanLen.as("mean_token_len"), alphaFrac.as("alpha_frac"),
      reason.isNull.as("keep"), reason.as("drop_reason"))
  }

  /** End-to-end curation pipeline — the composition a real corpus
    * build runs as ONE job: rule gate ([[gopherRules]]) → corpus-level
    * line dedup ([[CorpusStats.dedupLines]]) → exact dedup keep-one
    * (md5 of the cleaned text, smallest id is canonical — the l01
    * convention). Documents emptied by line removal are dropped.
    * Output, one row per surviving canonical document:
    * (doc_id, clean_len, n_dupes — how many kept docs collapsed into
    * this canonical text).
    *
    * Scale shape: each stage is individually scale-audited (map-only
    * rules; wordcount-shaped line df + anti-join; one hash aggregate
    * on a 32-char md5 key, never on the full text). Composing them
    * adds no new shuffle class — Catalyst pipelines the rule filter
    * into the line-dedup scan.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, minTokens: Int = 50, lineMinDocs: Int = 3): DataFrame = {
    val kept = gopherRules(docs, idCol, textCol, langCol,
        minTokens = minTokens)
      .filter(col("keep")).select(col("doc_id"))
    val keptDocs = docs.join(kept, docs(idCol) === kept("doc_id"))
      .select(docs(idCol), docs(textCol))
    val cleaned = CorpusStats
      .dedupLines(keptDocs, idCol, textCol, minDocs = lineMinDocs)
      .filter(col("clean_text") =!= "")
    cleaned
      .groupBy(md5(col("clean_text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"),
        min(length(col("clean_text")).cast("long")).as("clean_len"),
        count(lit(1)).as("n_dupes"))
      .select("doc_id", "clean_len", "n_dupes")
  }

  /** Adaptive per-group quality cutoff — thresholds that FOLLOW the
    * data instead of a global constant (a fixed length floor that is
    * right for English drops half of Chinese): per group (language,
    * source, …), the q-quantile of `valueCol` is estimated with the
    * mergeable KLL sketch and rows below their group's cutoff are
    * dropped. Output: the surviving rows as (doc_id, group, value,
    * cutoff).
    *
    * Scale shape: the sketch aggregate is mergeable (map-side partial
    * sketches, one k-bounded state per group), the cutoff table is
    * |groups| rows and broadcasts into a map-side filter — the corpus
    * is scanned twice but shuffled never. In the exact regime
    * (group ≤ k) the cutoff equals quantile_disc, which is what the
    * oracle checks; past k the sketch guarantee (≈O(1/k) rank error)
    * takes over, property-tested in SketchesSpec.
    */
  def adaptiveQuantileCut(docs: DataFrame, idCol: String, valueCol: String,
      groupCol: String, q: Double = 0.1, k: Int = 1024): DataFrame = {
    val cuts = docs.groupBy(col(groupCol))
      .agg(Sketches.kllSketch(col(valueCol), k).as("sk"))
      .select(col(groupCol),
        Sketches.kllQuantile(col("sk"), lit(q)).cast("long").as("cutoff"))
    docs.join(broadcast(cuts), groupCol)
      .filter(col(valueCol) >= col("cutoff"))
      .select(col(idCol).as("doc_id"), col(groupCol), col(valueCol),
        col("cutoff"))
  }
}
