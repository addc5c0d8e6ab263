package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Preference-pair construction for RLHF / DPO training sets: given
  * scored completions grouped by prompt, emit one (chosen, rejected)
  * pair per prompt — the highest- and lowest-scoring completions —
  * keeping only prompts with at least two candidates and a score
  * margin large enough to be signal rather than scorer noise
  * (reference semantics: the standard best-vs-worst pairing used to
  * build DPO corpora from k-sampled completions; part of the
  * LLM-pipeline extension surface, no counterpart in the reference
  * engine).
  *
  * Determinism contract: scores must be INTEGER (milli-units, e.g.
  * [[QualityClassifier.scoreLinear]]'s z_milli) and ids unique with
  * 0 <= id < 10^7; the selection key folds the id under the score
  * (score · 10^7 + id), so arg-max/arg-min are tie-free and both
  * engines pick the same row. |score| must stay below ~9·10^11 so the
  * fold cannot overflow a long.
  *
  * Scale shape: ONE map-side-combinable aggregate on the prompt key
  * with O(1) state per group (max_by/min_by carry a single candidate
  * each) — no sort, no window, no per-prompt candidate list ever
  * materializes. At 100 TB of completions this is a single shuffle of
  * per-partition group partials.
  */
object Preference {

  /** One row per surviving prompt: (prompt_id, n_candidates,
    * chosen_id, chosen_score, rejected_id, rejected_score, margin).
    */
  def preferencePairs(scored: DataFrame, promptCol: String, idCol: String,
      scoreCol: String, minMarginMilli: Long = 1L): DataFrame = {
    // The determinism contract above is ENFORCED, not just documented:
    // an id outside [0, 10^7) or a score outside ±9·10^11 would bleed
    // into the wrong component of the rank fold and silently pick the
    // wrong chosen/rejected row — fail loudly instead (r8 ADVICE). The
    // guard is a map-side when/raise_error on columns the aggregate
    // reads anyway; it costs two comparisons per row, no extra pass.
    val idOk = col(idCol) >= 0L && col(idCol) < 10000000L
    val scoreOk = abs(col(scoreCol)) < 900000000000L
    val checked = scored
      .withColumn(idCol,
        when(idOk, col(idCol)).otherwise(raise_error(concat(
          lit(s"preferencePairs: $idCol out of [0, 10^7): "),
          col(idCol).cast("string")))))
      .withColumn(scoreCol,
        when(scoreOk, col(scoreCol)).otherwise(raise_error(concat(
          lit(s"preferencePairs: |$scoreCol| >= 9e11 overflows the rank fold: "),
          col(scoreCol).cast("string")))))
    val rank = col(scoreCol) * lit(10000000L) + col(idCol)
    checked
      .groupBy(col(promptCol).as("prompt_id"))
      .agg(count(lit(1)).as("n_candidates"),
        max_by(col(idCol), rank).as("chosen_id"),
        max(col(scoreCol)).as("chosen_score"),
        min_by(col(idCol), rank).as("rejected_id"),
        min(col(scoreCol)).as("rejected_score"))
      .withColumn("margin", col("chosen_score") - col("rejected_score"))
      .filter(col("n_candidates") >= 2 && col("margin") >= minMarginMilli)
  }
}
