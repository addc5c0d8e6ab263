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

  /** Deterministic fixed-QUOTA sample: exactly min(k, |group|) rows
    * per group, selected by md5-hash order with id tie-break — the
    * reproducible form of per-stratum reservoir sampling (identical
    * selection on every run and every engine; rate-based hashSample
    * cannot promise an exact count). Scale shape: the per-group top-k
    * rides the O(k)-state [[graft.functions.TopKAgg]] — map-side
    * partial keeps k candidates per group per task, so the exchange
    * carries O(k · groups · partitions) rows, never the corpus; no
    * per-group sort, no full-window materialization.
    *
    * The hash is the md5-60 family truncated to 52 bits: the
    * aggregate scores in DOUBLE, and 60 bits past the 53-bit mantissa
    * would order differently from an oracle's integer compare.
    *
    * Returns (grp, id, rk) with rk 1..k in (hash DESC, id ASC) order.
    */
  def quotaSample(docs: DataFrame, groupCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"quota k must be >= 1, got $k")
    val h = shiftright(Dedup.md5Hash60(col(idCol).cast("string")), 8)
    docs.select(col(groupCol).as("grp"), col(idCol).as("id"), h.as("h"))
      .groupBy(col("grp"))
      .agg(graft.functions.TopKAgg.topKBy(col("h").cast("double"), col("id"), k)
        .as("top"))
      .select(col("grp"), posexplode(col("top")))
      .select(col("grp"), col("col.id").as("id"),
        (col("pos") + 1).cast("long").as("rk"))
  }

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

  /** Token-budget mixture sampling: turn TARGET TOKEN SHARES into
    * per-source document sampling rates — the step that converts a
    * mixture spec ("20% of training tokens from src0") into an
    * executable filter when sources differ wildly in size. Per source
    * s: rate_s = min(1, budget·share_s / tokens_s); documents are then
    * kept by the deterministic [[hashBucket]] rule at that rate, so
    * the realized token mix tracks the target in expectation while
    * membership stays content-hashed (reproducible, re-run-stable).
    * Sources missing from `shares` get `defaultShare`.
    *
    * Determinism across engines: budget·share is folded to one driver-
    * side double literal and the rate is ONE division, so the
    * bucket-vs-round(rate·10000) comparison sees bit-identical values
    * anywhere IEEE doubles are IEEE doubles.
    *
    * Scale shape: token counting is a map-only column expression; the
    * per-source totals are one tiny aggregate (|sources| rows) that
    * broadcasts back; the filter itself is map-side. No shuffle
    * touches document text. Output: the kept (doc_id, source,
    * n_tokens) rows.
    */
  def tokenBudgetSample(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      budgetTokens: Long,
      shares: Map[String, Double],
      defaultShare: Double = 0.0): DataFrame = {
    require((shares.values ++ Seq(defaultShare)).forall(s => s >= 0 && s <= 1),
      "all shares must be in [0,1]")
    // NULL text would otherwise count as size(NULL) = -1 tokens,
    // silently deflating per-source totals (and emitting -1 rows);
    // clamp to 0 — NULL-keyed rows keep hashBucket's bucket-0
    // convention (kept at any positive rate) but contribute nothing
    // to the budget.
    val nTok = greatest(coalesce(size(filter(split(lower(col(textCol)),
      graft.kernel.TextKernel.WsPlus), t => t =!= "")).cast("long"), lit(0L)), lit(0L))
    val base = docs.select(col(idCol).as("doc_id"),
      col(sourceCol).as("source"), nTok.as("n_tokens"),
      hashBucket(col(textCol)).as("bkt"))
    val totals = base.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("src_tokens"))
    val budgetShare = shares.foldLeft(lit(budgetTokens * defaultShare): Column) {
      case (acc, (s, sh)) =>
        when(col("source") === lit(s), lit(budgetTokens * sh)).otherwise(acc)
    }
    val rates = totals.withColumn("rate",
      least(lit(1.0), budgetShare / col("src_tokens")))
    base.join(broadcast(rates), "source")
      .filter(col("bkt") < round(col("rate") * 10000))
      .select("doc_id", "source", "n_tokens")
  }

  /** Temperature-balanced mixture — the multilingual upsampling recipe
    * (mC4 / XLM-R style): per-stratum keep rates derived from the
    * corpus's OWN counts with share_s ∝ n_s^τ, so dominant strata are
    * downsampled and rare ones kept whole. τ is fixed at 0.5 (sqrt):
    * IEEE sqrt is correctly rounded in every engine while pow is only
    * faithfully rounded — sqrt is the τ a cross-engine-exact oracle
    * can re-derive bit-for-bit (the determinism boundary, stated
    * rather than hidden).
    *
    *   w_s = sqrt(n_s);  W = Σ w_s folded in ASCENDING stratum order
    *   (explicit fold — a plain SUM's association is engine-private;
    *   "ascending" means UTF-8 BYTE order, DuckDB's binary collation,
    *   which the driver reproduces by comparing getBytes(UTF_8) —
    *   Scala's String ordering is UTF-16 code-unit order and the two
    *   disagree once strata mix U+E000..U+FFFF with supplementary
    *   characters, the same trap BpeTrainer's tie-break documents);
    *   rate_s = min(1, ((B · w_s) / W) / n_s);
    *   keep iff hashBucket(text) < floor(rate_s · 10⁴).
    *
    * Scale shape: one |strata|-row aggregate to the driver (bounded —
    * strata are languages/sources), rates ride back as a BROADCAST
    * joined thresholds table (map-side hash lookup — the literal CASE
    * chain this replaces was one nested when() per stratum, and
    * Catalyst recurses over expression trees: unbounded strata would
    * blow the analyzer stack long before any guard tripped), and the
    * mixture is a map-side filter — no shuffle, text never moves.
    * Strata are capped at 500 (loud guard): the thresholds ride as a
    * broadcast literal table, so the stratum set must be model-sized.
    */
  def temperatureMix(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      stratumCol: String,
      budgetDocs: Long): DataFrame = {
    require(budgetDocs >= 0)
    // strata are languages/sources — a bounded model table. Guard the
    // driver collect loudly (the r8-advice contract-enforcement rule):
    // a high-cardinality stratumCol (say, doc_id) would otherwise pull
    // a corpus-sized result onto the driver. 500 is the honest bound:
    // the rates ride back as a broadcast literal table, and a
    // many-thousand-entry literal map is a plan-size smell, not a
    // mixing stratum set (languages × sources tops out in the
    // hundreds).
    val maxStrata = 500
    val counts0 = docs.groupBy(col(stratumCol).as("s"))
      .agg(count(lit(1)).as("n"))
      .limit(maxStrata + 1)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    require(counts0.length <= maxStrata,
      s"temperatureMix: over $maxStrata distinct strata in '$stratumCol' — " +
        "that is a key column, not a mixing stratum")
    // NULL strata are DROPPED (documented): they get no thresholds row
    // (left join → null → coalesce 0, an always-false bucket test),
    // and the driver-side sort would NPE on a null key otherwise.
    val counts = counts0.filter(_._1 != null)
      .sortWith((a, b) => utf8Lt(a._1, b._1))
    val ws = counts.map { case (s, n) => (s, n, math.sqrt(n.toDouble)) }
    val bigW = ws.foldLeft(0.0) { case (acc, (_, _, w)) => acc + w }
    val milli = ws.map { case (s, n, w) =>
      val rate = math.min(1.0, ((budgetDocs.toDouble * w) / bigW) / n.toDouble)
      s -> math.floor(rate * 10000).toLong
    }
    val spark = docs.sparkSession
    import spark.implicits._
    // Collision-proof join-column names (r10 advice): a caller's doc
    // frame may legitimately carry columns named "s"/"thr" (or mix ON
    // stratumCol == "s"), which would make the equi-join condition
    // ambiguous. The __graft_ prefix is reserved across the ops
    // surface; both columns are dropped before the final select.
    val thresholds = milli.toSeq.toDF("__graft_stratum", "__graft_thr")
    docs.join(broadcast(thresholds),
        col(stratumCol) === col("__graft_stratum"), "left")
      .filter(hashBucket(col(textCol)) < coalesce(col("__graft_thr"), lit(0L)))
      .select(col(idCol).as("doc_id"), col(stratumCol).as("stratum"))
  }

  /** UTF-8 byte-order (unsigned) string comparison — DuckDB's binary
    * collation, so driver-side fold orders match the oracle's
    * `ORDER BY` exactly. Scala's natural String order compares UTF-16
    * code units, which sorts supplementary characters BELOW
    * U+E000..U+FFFF; UTF-8 bytes sort them above.
    */
  private[graft] def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }
}
