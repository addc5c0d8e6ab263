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

  /** The four gate signals in ONE compiled kernel pass per document:
    * (n_tokens, sum_chars, n_alpha, has_stop), NULL struct for NULL
    * text (matching the expression form's null flow field-for-field).
    *
    * r14 (guide §1.2 step 2 / §4): the original derivation built four
    * higher-order expressions over the token array —
    * `aggregate(transform(...))` for char sums, `filter(x.rlike(...))`
    * for the alpha count, `arrays_overlap` for stopwords. HOF lambdas
    * are NOT whole-stage-codegen'd (interpreted per element), and the
    * per-token regex rode the x15 pipeline's hottest map stage (the
    * 500k-doc rules gate). One tight char-loop over
    * [[TextKernel.tokens]] computes all four signals; measured
    * same-JVM interleaved at 500k docs: 3.2–3.8 s → 2.4–3.0 s on the
    * gate count (~1.3× — tokenization itself dominates both forms and
    * is attacked separately in TextKernel.splitWsNonEmpty), identical
    * keep counts every cycle, outputs spec-pinned against the
    * expression form incl. the null/empty/unicode edges; the
    * l41/l43/l44/x15-chain oracle rows re-verified green.
    * Semantics preserved exactly: token class is the repo-wide
    * lowercase WsPlus split; char counts are CODE POINTS
    * (`length()`/UTF8String.numChars counts code points, so the twin
    * is codePointCount, not String.length); the alpha predicate
    * `rlike "^[a-z]+$"` means non-empty and all-ASCII-lowercase
    * (tokens cannot contain the line terminators that would make the
    * anchors diverge from a full match).
    */
  private def gopherStats(textCol: Column,
      stopwords: Seq[String]): Column = {
    val stopSet = stopwords.toSet
    val statsUdf = udf((text: String) =>
      if (text == null) null
      else {
        val t = TextKernel.tokens(text)
        var sumChars = 0L
        var nAlpha = 0L
        var hasStop = false
        var i = 0
        while (i < t.length) {
          val w = t(i)
          sumChars += w.codePointCount(0, w.length).toLong
          var alpha = w.length > 0
          var j = 0
          while (alpha && j < w.length) {
            val c = w.charAt(j)
            alpha = c >= 'a' && c <= 'z'
            j += 1
          }
          if (alpha) nAlpha += 1
          if (!hasStop && stopSet.contains(w)) hasStop = true
          i += 1
        }
        (t.length.toLong, sumChars, nAlpha, hasStop)
      })
    statsUdf(textCol)
  }

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
      allowedLangs: Seq[String] = Seq("en", "es", "de", "fr")): Column =
    reasonFromStats(gopherStats(textCol, stopwords), langCol, minTokens,
      maxTokens, minMeanLen, maxMeanLen, minAlphaFrac, allowedLangs)

  /** The rule cascade over a [[gopherStats]] struct — shared by
    * [[gopherReason]] and [[gopherRules]] so the kernel runs once per
    * row (two independent udf() instances would defeat Catalyst's
    * common-subexpression elimination).
    */
  private def reasonFromStats(gs: Column, langCol: Column,
      minTokens: Int, maxTokens: Int, minMeanLen: Double,
      maxMeanLen: Double, minAlphaFrac: Double,
      allowedLangs: Seq[String]): Column = {
    val n = gs.getField("_1")
    val sumChars = gs.getField("_2")
    val nAlpha = gs.getField("_3")
    val hasStop = gs.getField("_4")
    val meanLen = when(n > 0, sumChars.cast("double") / n)
    val alphaFrac = when(n > 0, nAlpha.cast("double") / n)
    when(n < minTokens, "too_short")
      .when(n > maxTokens, "too_long")
      .when(meanLen < minMeanLen || meanLen > maxMeanLen, "token_len")
      .when(alphaFrac < minAlphaFrac, "alpha")
      .when(!hasStop, "stopwords")
      .when(!langCol.isin(allowedLangs.map(lit(_)): _*), "lang")
  }

  /** The pre-r14 expression form of [[gopherStats]]'s signals — kept
    * ONLY for the equality spec that pins the kernel to it (and as the
    * readable definition of the semantics). Not on any query path.
    */
  private[graft] def gopherStatsExprLegacy(textCol: Column,
      stopwords: Seq[String]): Column = {
    val t = toks(textCol)
    val n = size(t).cast("long")
    val sumChars = aggregate(transform(t, x => length(x).cast("long")),
      lit(0L), (a, x) => a + x)
    val nAlpha = size(filter(t, x => x.rlike("^[a-z]+$"))).cast("long")
    val hasStop = arrays_overlap(t, array(stopwords.map(lit): _*))
    when(textCol.isNotNull, struct(n.as("_1"), sumChars.as("_2"),
      nAlpha.as("_3"), hasStop.as("_4")))
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
    val gs = gopherStats(col(textCol), stopwords)
    val n = gs.getField("_1")
    val sumChars = gs.getField("_2")
    val nAlpha = gs.getField("_3")
    val meanLen = when(n > 0, sumChars.cast("double") / n)
    val alphaFrac = when(n > 0, nAlpha.cast("double") / n)
    val reason = reasonFromStats(gs, col(langCol), minTokens,
      maxTokens, minMeanLen, maxMeanLen, minAlphaFrac, allowedLangs)
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
