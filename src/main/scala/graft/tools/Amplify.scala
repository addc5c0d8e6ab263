package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Replica-derivation transforms shared by [[ScaleUp]] (writes derived
  * SF dirs to disk) and the bench-time corpus amplification in
  * `queries/BenchHeavy` (derives in-plan, nothing written).
  *
  * Replicas must be DISJOINT near-dup universes or the derived corpus
  * measures a pathological workload: identical document replicas put
  * every cross-replica pair at Jaccard 1.0 (candidate pairs grow
  * quadratically in n); identical embedding replicas pair at cosine
  * 1.0. Documents therefore get a replica-specific character pair
  * injected every 8 chars (cross-replica 5-gram Jaccard measured 0.34,
  * below dedup thresholds — SCALE.md), and embeddings a norm-
  * preserving circular rotation (cross-replica cosine ≈ 0.02) with the
  * blocking `label` shifted per replica like every other key.
  */
object Amplify {
  /** Above every key in sf0.1 (max l_orderkey ~ 6e5) and big enough
    * that 1000 replicas stay far from Long overflow. */
  val KeyOffset = 10000000L

  private def reps(df: DataFrame, n: Int): DataFrame =
    broadcast(df.sparkSession.range(n).toDF("rep"))

  /** n disjoint salted replicas of the documents relation. */
  def documents(df: DataFrame, n: Int): DataFrame = {
    // three-letter salt (A-Z × a-z × A-Z = 17,576 distinct reps — a
    // two-letter salt capped disjointness at 676 and replicas beyond
    // that were byte-identical, which at the sf100 derivation (n=1000)
    // would have made cross-replica Jaccard 1.0 and candidate pairs
    // quadratic); letters only — '$' or '\' would be group references
    // in the regexp_replace replacement string
    val salt = concat(
      chr(lit(65) + pmod(col("rep"), lit(26))),
      chr(lit(97) + pmod(floor(col("rep") / 26), lit(26))),
      chr(lit(65) + pmod(floor(col("rep") / 676), lit(26))))
    df.crossJoin(reps(df, n)).select(
      (col("doc_id") + col("rep") * KeyOffset).as("doc_id"),
      regexp_replace(col("text"), lit("(.{8})"), concat(lit("$1"), salt)).as("text"),
      col("lang"), col("source"), col("n_chars"))
  }

  /** n user-disjoint replicas of the events relation: each replica is
    * a fresh user universe (user_id/event_id shifted), timestamps kept
    * — so key-partitioned time-series operators (asof, range join,
    * sessions) see n× the users with the same per-user time density,
    * which is how real event volume grows.
    */
  def events(df: DataFrame, n: Int): DataFrame =
    df.crossJoin(reps(df, n)).select(
      (col("event_id") + col("rep") * KeyOffset).as("event_id"),
      col("ts"),
      (col("user_id") + col("rep") * KeyOffset).as("user_id"),
      col("event_type"), col("value"), col("props"))

  /** n rotation-disjoint replicas of the embeddings relation. */
  def embeddings(df: DataFrame, n: Int): DataFrame = {
    val dim = size(col("embedding"))
    val k = pmod(col("rep"), dim)
    df.crossJoin(reps(df, n)).select(
      (col("vec_id") + col("rep") * KeyOffset).as("vec_id"),
      concat(slice(col("embedding"), k + 1, dim - k),
        slice(col("embedding"), lit(1), k)).as("embedding"),
      (col("label") + col("rep") * KeyOffset).as("label"))
  }
}
