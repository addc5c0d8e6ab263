package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity-search operators.
  *
  * Scale design: brute-force top-k is the correctness baseline and is
  * only sane when one side is small (queries broadcast against the full
  * corpus — a map-only pass, no shuffle of the corpus). The scale path
  * is LSH bucketing: deterministic random-hyperplane signs partition
  * the corpus; candidate generation joins on the bucket key only. Both
  * avoid materializing an all-pairs product.
  */
object Similarity {

  /** Left-to-right double-accumulated dot product of two float arrays —
    * written as higher-order functions (codegen'd, no UDF). The strict
    * sequential order makes the result bit-reproducible and
    * oracle-comparable.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: every query (small, broadcast) against
    * every corpus vector, per-query top-k by (cosine desc, vec_id).
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int): DataFrame = {
    val joined = corpus
      .select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(queries.select(
        col("vec_id").as("query_id"), col("embedding").as("query_emb"))))
      .select(
        col("query_id"), col("vec_id"),
        cosine(col("embedding"), col("query_emb")).as("cos"))
      .filter(col("query_id") =!= col("vec_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("cos"), col("rank").cast("long").as("rank"))
  }

  /** Deterministic random-hyperplane LSH bucket id (nBits sign bits).
    * Hyperplane component h(b, d) = mix of (b, d) — no stored model, so
    * executors recompute it identically with zero coordination.
    */
  def lshBucket(embedding: Column, nBits: Int, dim: Int, seed: Long = 0L): Column = {
    def planeComponent(b: Int, d: Int): Double = {
      // splitmix64-derived pseudo-random in [-1, 1), stable across JVMs
      var x = (b.toLong + seed * 8191L) * 0x9e3779b97f4a7c15L +
        d.toLong * 0xbf58476d1ce4e5b9L + 0x94d049bb133111ebL
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x = x ^ (x >>> 31)
      (x.toDouble / Long.MaxValue.toDouble)
    }
    (0 until nBits).map { b =>
      val proj = (0 until dim).map { d =>
        element_at(embedding, d + 1).cast("double") * lit(planeComponent(b, d))
      }.reduce(_ + _)
      when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** LSH-bucketed approximate near-duplicate pairs: corpus shuffles on
    * the bucket key; pairs form only within a bucket and are verified
    * with the exact cosine. Multi-probe = nTables independent bucketings
    * unioned (recall knob).
    */
  def lshNearDupPairs(
      corpus: DataFrame,
      dim: Int,
      nBits: Int = 12,
      nTables: Int = 4,
      threshold: Double = 0.9): DataFrame = {
    val tables = (0 until nTables).map { t =>
      // per-table seed gives independent hyperplane sets
      corpus.select(
        col("vec_id"), col("embedding"),
        lshBucket(col("embedding"), nBits, dim, seed = t.toLong).as("bucket"),
        lit(t).as("table_id"))
    }.reduce(_ unionAll _)
    val left = tables.select(col("table_id"), col("bucket"),
      col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val right = tables.select(col("table_id"), col("bucket"),
      col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    left
      .join(right, Seq("table_id", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("emb_a"), col("emb_b")).as("cos"))
      .filter(col("cos") >= threshold)
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("cos")).as("cos"))
  }

  /** Exact near-duplicate pairs within a blocking key (e.g. a cluster
    * or label column): deterministic, oracle-checkable, and the same
    * shape the LSH variant produces.
    */
  def blockedNearDupPairs(
      corpus: DataFrame,
      blockCol: String,
      threshold: Double): DataFrame = {
    val left = corpus.select(col(blockCol).as("blk"),
      col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val right = corpus.select(col(blockCol).as("blk"),
      col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    left
      .join(right, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("emb_a"), col("emb_b")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
