package graft.ops

import graft.kernel.TextKernel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sequence packing for LM training — the
  * concat-and-chunk layout every trainer's data loader performs:
  * documents are laid out end-to-end in a deterministic stream order
  * and the stream is cut into fixed `budget`-token packs. The op
  * computes, per document, which pack its first token lands in and at
  * what offset — the shuffle-once, resume-anywhere index a training
  * job needs to seek into a 100 TB corpus without materializing the
  * concatenated stream.
  *
  * Determinism: stream order inside a bucket is (md5(doc_id), doc_id)
  * — content-independent, engine-neutral (the l13 hash family), and
  * stable under corpus append *within unchanged buckets*. Zero-token
  * documents occupy no stream space but still receive the
  * (pack, offset) of their start position.
  *
  * Scale design: a single global stream would serialize the window
  * into one task, so the stream is SHARDED — documents hash into
  * `buckets` independent streams (md5 bucket of the id), and the
  * cumulative-sum window partitions by bucket: one shuffle, `buckets`-
  * way parallel, each task a linear scan. At 100 TB you raise
  * `buckets` with the corpus (each bucket is an independent epoch
  * shard — trainers consume shards round-robin); no stage sees more
  * than corpus/buckets rows, and nothing is collected. Token counting
  * is one [[TextKernel.tokens]] kernel pass, map-side.
  */
object Packing {

  private val nTokensUdf = udf((text: String) =>
    TextKernel.tokens(text).length.toLong)

  /** Pack layout: (doc_id, bucket, n_tokens, start_offset, pack_id,
    * offset_in_pack). `pack_id` numbers packs within a bucket from 0;
    * `start_offset` is the document's first-token position in its
    * bucket's concatenated stream.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      budget: Int, buckets: Int): DataFrame =
    packCounted(docs.select(col(idCol).as("doc_id"),
        nTokensUdf(col(textCol)).as("n_tokens")),
      "doc_id", "n_tokens", budget, buckets)

  /** [[packSequences]] over a precomputed token-count column — the
    * entry point when counts come from a real tokenizer (e.g.
    * [[BpeTrainer.bpeTokenCounts]]) instead of the whitespace kernel.
    */
  def packCounted(counted: DataFrame, idCol: String, nTokensCol: String,
      budget: Int, buckets: Int): DataFrame =
    packCountedCarry(counted, idCol, nTokensCol, budget, buckets, Nil)

  /** [[packCounted]] with pass-through payload columns (r14): `carry`
    * columns ride the SAME bucket-keyed window exchange the layout
    * already pays and come out in the window's (bucket, rk, doc_id)
    * partition-local order — so a consumer that needs the payload
    * co-located and stream-ordered with the layout (BpeTrainer's pack
    * assembly) gets it for ZERO additional exchanges, instead of
    * re-joining the payload onto the layout afterwards (a second
    * corpus-sized shuffle). With `carry = Nil` the plan and output are
    * exactly the pre-r14 packCounted.
    */
  def packCountedCarry(counted: DataFrame, idCol: String,
      nTokensCol: String, budget: Int, buckets: Int,
      carry: Seq[String]): DataFrame = {
    require(budget > 0 && buckets > 0, "budget and buckets must be positive")
    val keyed = counted.select((Seq(col(idCol).as("doc_id"),
        col(nTokensCol).cast("long").as("n_tokens"),
        md5(col(idCol).cast("string")).as("rk")) ++ carry.map(col)): _*)
      .withColumn("bucket",
        Sampling.hashBucket(col("doc_id").cast("string")) % buckets)
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("rk"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keyed
      .withColumn("start_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("pack_id", floor(col("start_offset") / budget))
      .withColumn("offset_in_pack", col("start_offset") % budget)
      .select(("doc_id" +: "bucket" +: "n_tokens" +: "start_offset" +:
        "pack_id" +: "offset_in_pack" +: carry).map(col): _*)
  }
}
