package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / source-mixing operators for training-data
  * pipelines.
  *
  * Scale design: rates are enforced with CONTENT HASHES, not RNG —
  * `md5(key) mod N < rate·N` — so a sample is (a) reproducible across
  * runs, partitionings and engines, (b) a pure map-side filter (no
  * shuffle, pushdown-friendly), and (c) stable under re-runs over
  * changed corpora: a document's membership never depends on which
  * other documents exist. That last property is what makes hash
  * sampling the standard for dataset mixing — resampling after an
  * upstream refresh only changes membership of changed documents.
  */
object Sampling {

  /** Uniform [0, 10000) bucket from the first 8 hex chars of md5(key):
    * identical arithmetic is expressible in any engine with md5.
    * NULL keys land in bucket 0 (included whenever rate > 0) — a NULL
    * predicate would otherwise silently DROP NULL-keyed rows even at
    * rate 1.0.
    */
  def hashBucket(key: Column): Column =
    coalesce(conv(substring(md5(key), 1, 8), 16, 10).cast("long") % 10000, lit(0L))

  /** Keep rows whose hash bucket falls under rate (0.0-1.0), resolved
    * at 1/10000 granularity.
    */
  def hashSample(df: DataFrame, keyCol: String, rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    df.filter(hashBucket(col(keyCol)) < lit((rate * 10000).round))
  }

  /** Per-stratum deterministic rates (e.g. mixing weights per source /
    * language / quality tier). Strata missing from `rates` get
    * `defaultRate`. One map-side filter, no shuffle: the mixture is a
    * WHERE clause, not a join.
    */
  def stratifiedHashSample(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 0.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "all rates must be in [0,1]")
    val threshold = rates.foldLeft(lit((defaultRate * 10000).round): Column) {
      case (acc, (stratum, rate)) =>
        when(col(stratumCol) === lit(stratum), lit((rate * 10000).round))
          .otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol)) < threshold)
  }
}
