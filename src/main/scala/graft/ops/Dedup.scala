package graft.ops

import graft.kernel.TextKernel
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication operators for training-data pipelines.
  *
  * Scale design: every variant is shuffle-bounded — exact dedup is one
  * hash-partitioned aggregation; MinHash/SimHash near-dup generate
  * candidates through BAND BUCKETS (shuffle on the band key, pairs only
  * within a bucket) and never compare all pairs. At 100 TB the bucket
  * join is the only quadratic-risk step, and its blow-up is bounded by
  * bucket size (salt-able if a degenerate bucket appears).
  */
object Dedup {

  /** Exact dedup by content hash: one representative (min id) per
    * distinct text, with duplicate count.
    */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("doc_id"), count(lit(1)).as("n_dups"))

  /** Connected components over an undirected near-dup pair list —
    * the cluster-formation step between candidate pairs and canonical
    * document selection. Iterative distributed min-label propagation
    * with path-halving: each round a node adopts
    * min(own label, neighbors' labels, label-of-own-label), so chains
    * converge in O(log diameter) rounds instead of O(diameter).
    * Each round is two joins + one aggregation, fully partitioned —
    * no driver-side graph; the driver only sees the changed-count.
    * Output: (id, component) with component = min id in the component.
    * NOTE: the returned DataFrame is persisted (it is the last
    * iteration's cache) — callers owning a long-lived session should
    * unpersist() it when done. At 100 TB additionally localCheckpoint
    * each round to truncate lineage.
    */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 25): DataFrame = {
    val edges = pairs.select(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst"))
      .unionAll(pairs.select(col("id_b").cast("long").as("src"), col("id_a").cast("long").as("dst")))
      .distinct()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
    var it = 0
    var converged = false
    while (!converged && it < maxIters) {
      // min label among neighbors
      val viaNeighbor = edges
        .join(labels.select(col("id").as("dst"), col("label").as("nl")), "dst")
        .groupBy(col("src").as("id")).agg(min(col("nl")).as("nmin"))
      // label of own label (path halving)
      val parentLabels = labels.select(col("id").as("label"), col("label").as("pl"))
      val viaParent = labels.join(parentLabels, Seq("label"))
        .select(col("id"), col("pl"))
      val next = labels
        .join(viaNeighbor, Seq("id"), "left")
        .join(viaParent, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nmin"), col("label")),
            coalesce(col("pl"), col("label"))).as("label"))
        .persist()
      val changed = next.join(labels.withColumnRenamed("label", "old"), "id")
        .filter(col("label") =!= col("old")).limit(1).count()
      labels.unpersist(blocking = false)
      labels = next
      converged = changed == 0
      it += 1
    }
    // Partially-propagated labels are silently wrong — refuse to hand
    // them back. Path-halving converges in O(log diameter) rounds, so
    // hitting this means the iteration budget is genuinely too small.
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge within $maxIters iterations; " +
        "raise maxIters (rounds needed grow with log of the graph diameter)")
    labels.select(col("id"), col("label").as("component"))
  }

  /** Character n-gram shingle array (distinct) — a pure column
    * expression so Catalyst keeps it in codegen.
    */
  def shingles(text: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - (n - 1), lit(0))),
      i => text.substr(i, lit(n))))

  /** Exact n-gram Jaccard similarity between two text columns. */
  def ngramJaccard(a: Column, b: Column, n: Int): Column = {
    def sh(t: Column): Column = shingles(t, n)
    val inter = size(array_intersect(sh(a), sh(b)))
    val union = size(array_union(sh(a), sh(b)))
    when(union === 0, lit(1.0)).otherwise(inter.cast("double") / union.cast("double"))
  }

  private val minhashUdf = udf((text: String, shingleN: Int, numHashes: Int) =>
    TextKernel.minhashSignature(TextKernel.shingleHashes(text, shingleN), numHashes))

  /** MinHash+LSH near-duplicate pairs.
    *
    * shingle → minhash signature (numHashes) → band buckets (bands ×
    * rowsPerBand) → within-bucket candidate pairs → exact Jaccard
    * verify ≥ threshold. Output: (id_a, id_b, jaccard) with id_a <
    * id_b, distinct.
    */
  def minhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 5,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.7): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    val sigs = docs.select(
      col(idCol).as("id"), col(textCol).as("text"),
      minhashUdf(col(textCol), lit(shingleN), lit(numHashes)).as("sig"))
    // band key = (band index, hash of that band's slice of the signature)
    val banded = sigs.select(
      col("id"), col("text"),
      posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
    val left = banded.select(col("band"), col("band_hash"),
      col("id").as("id_a"), col("text").as("text_a"))
    val right = banded.select(col("band"), col("band_hash"),
      col("id").as("id_b"), col("text").as("text_b"))
    left
      .join(right, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Dedup.ngramJaccard(col("text_a"), col("text_b"), shingleN).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("jaccard")).as("jaccard"))
  }

  private val simhashUdf = udf((text: String) =>
    TextKernel.simhash64(TextKernel.tokens(text)))

  /** SimHash near-duplicate pairs: 64-bit simhash, bucketed by 16-bit
    * bands (a pair within Hamming distance ≤ maxHamming such that one
    * of 4 bands is identical is found; 4 bands ⇒ guaranteed recall for
    * distance ≤ 3), verified by exact Hamming distance.
    */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val hammingUdf = udf((a: Long, b: Long) => TextKernel.hammingDistance(a, b))
    val sigs = docs.select(col(idCol).as("id"), simhashUdf(col(textCol)).as("sim"))
    val banded = sigs.select(col("id"), col("sim"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sim"), b * 16).bitwiseAND(lit(0xffffL))): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_bits")
    val left = banded.select(col("band"), col("band_bits"),
      col("id").as("id_a"), col("sim").as("sim_a"))
    val right = banded.select(col("band"), col("band_bits"),
      col("id").as("id_b"), col("sim").as("sim_b"))
    left
      .join(right, Seq("band", "band_bits"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hammingUdf(col("sim_a"), col("sim_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("hamming")).as("hamming"))
  }

  private val winnowUdf = udf((text: String, k: Int, w: Int) =>
    TextKernel.winnowFingerprints(text, k, w))

  /** Winnowing fingerprint set per document (MOSS scheme). */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      winnowUdf(col(textCol), lit(k), lit(w)).as("fingerprints"))
}
