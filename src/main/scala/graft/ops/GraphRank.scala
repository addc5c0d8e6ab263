package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph ranking for crawl curation — PageRank over an edge
  * list, the standard signal for prioritizing/weighting web documents
  * before they enter a pretraining corpus (the reference engine ships
  * no graph operators; this is part of the LLM-pipeline extension
  * surface, alongside dedup/decontamination/mixing).
  *
  * Scale shape (the Pregel iteration expressed relationally): one
  * pass pre-joins out-degrees onto the edge list; each iteration is
  * then exactly one shuffle — contributions `rank/odeg` flow along
  * edges and hash-aggregate on `dst` — plus a 1-row dangling-mass
  * aggregate. Nothing corpus-sized ever reaches the driver. Lineage
  * is truncated per iteration with an eager `localCheckpoint` (NOT
  * `cache`): a cached iteration nests the previous plan's text inside
  * its InMemoryRelation argString and the plan string grows
  * geometrically with iterations — the same driver-OOM failure mode
  * measured and fixed in [[BpeTrainer.trainMerges]].
  */
object GraphRank {

  /** Fixed-iteration PageRank. `edges` must have `src` and `dst`
    * columns (any integral/string type; duplicate edges count once —
    * the relation is de-duplicated up front so out-degree is
    * well-defined). The node set is every id appearing as src or dst.
    * Dangling nodes (no out-edges) redistribute their mass uniformly,
    * the standard correction. Returns (id, rank) with Σ rank = 1.
    */
  def pageRank(edges: DataFrame, iters: Int,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val e = edges.select(col("src"), col("dst")).distinct()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("odeg"))
    // Pre-join the degree once: every iteration reuses this relation.
    // Only edgesW is materialized — `e` exists solely to feed it (one
    // pass), and the node set derives from edgesW, so the edge list
    // hits executor storage exactly once.
    val edgesW = e.join(outdeg, Seq("src")).localCheckpoint(true)
    val nodes = edgesW.select(col("src").as("id"))
      .union(edgesW.select(col("dst").as("id")))
      .distinct().localCheckpoint(true)
    val n = nodes.count()
    if (n == 0) return nodes.withColumn("rank", lit(0.0d))
    val base = (1.0 - damping) / n
    var ranks = nodes.select(col("id"), lit(1.0 / n).as("rank"))
      .localCheckpoint(true)
    val hasDangling = !nodes
      .join(edgesW.select(col("src").as("id")), Seq("id"), "left_anti")
      .isEmpty
    for (_ <- 0 until iters) {
      // Mass parked on dangling nodes, redistributed uniformly. The
      // aggregate is 1 row; skipped entirely when the graph has none.
      val dm: Double =
        if (!hasDangling) 0.0
        else ranks
          .join(edgesW.select(col("src").as("id")), Seq("id"), "left_anti")
          .agg(coalesce(sum(col("rank")), lit(0.0d))).head().getDouble(0)
      val inflow = edgesW
        .join(ranks, edgesW("src") === ranks("id"))
        .select(col("dst").as("id"),
          (col("rank") / col("odeg")).as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("inflow"))
      val next = nodes.join(inflow, Seq("id"), "left")
        .select(col("id"),
          (lit(base + damping * dm / n) +
            lit(damping) * coalesce(col("inflow"), lit(0.0d))).as("rank"))
        .localCheckpoint(true)
      ranks.unpersist()
      ranks = next
    }
    ranks
  }

  /** Personalized PageRank: teleport mass concentrates on `seeds`
    * (one `id` column) instead of the uniform prior — the standard
    * graph-proximity signal for seed-based corpus selection ("rank
    * documents by link proximity to a trusted seed set"). Same
    * iteration shape and cost as [[pageRank]]; the teleport vector is
    * 1/|S| on seeds and 0 elsewhere, the initial ranks equal it, and
    * dangling mass redistributes over the seed distribution (the
    * standard PPR correction). Seeds outside the graph's node set are
    * ignored; an empty effective seed set is an error.
    */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
      iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val e = edges.select(col("src"), col("dst")).distinct()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("odeg"))
    val edgesW = e.join(outdeg, Seq("src")).localCheckpoint(true)
    val nodes0 = edgesW.select(col("src").as("id"))
      .union(edgesW.select(col("dst").as("id")))
      .distinct()
    val seedSet = seeds.select(col("id")).distinct()
    val nodes = nodes0
      .join(seedSet.withColumn("is_seed", lit(true)), Seq("id"), "left")
      .select(col("id"), coalesce(col("is_seed"), lit(false)).as("is_seed"))
      .localCheckpoint(true)
    val nSeeds = nodes.filter(col("is_seed")).count()
    require(nSeeds > 0, "no seed ids present in the graph")
    def tele: Column = when(col("is_seed"), lit(1.0 / nSeeds))
      .otherwise(lit(0.0d))
    var ranks = nodes.select(col("id"), col("is_seed"), tele.as("rank"))
      .localCheckpoint(true)
    val hasDangling = !nodes
      .join(edgesW.select(col("src").as("id")), Seq("id"), "left_anti")
      .isEmpty
    for (_ <- 0 until iters) {
      val dm: Double =
        if (!hasDangling) 0.0
        else ranks
          .join(edgesW.select(col("src").as("id")), Seq("id"), "left_anti")
          .agg(coalesce(sum(col("rank")), lit(0.0d))).head().getDouble(0)
      val inflow = edgesW
        .join(ranks.select(col("id"), col("rank")),
          edgesW("src") === col("id"))
        .select(col("dst").as("id"), (col("rank") / col("odeg")).as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("inflow"))
      val next = nodes.join(inflow, Seq("id"), "left")
        .select(col("id"), col("is_seed"),
          ((lit(1.0 - damping) + lit(damping * dm)) * tele +
            lit(damping) * coalesce(col("inflow"), lit(0.0d))).as("rank"))
        .localCheckpoint(true)
      ranks.unpersist()
      ranks = next
    }
    ranks.select(col("id"), col("rank"))
  }

  /** Per-domain authority over a (doc domain → outlink domain) edge
    * list, then joined back as a document weight — the composed form a
    * crawl-curation pipeline uses (rank domains, weight docs).
    */
  def domainAuthority(docs: DataFrame, domainCol: String,
      outDomainCol: String, iters: Int,
      damping: Double = 0.85): DataFrame =
    pageRank(
      docs.select(col(domainCol).as("src"), col(outDomainCol).as("dst")),
      iters, damping)
      .withColumnRenamed("id", "domain")
      .withColumnRenamed("rank", "authority")
}
