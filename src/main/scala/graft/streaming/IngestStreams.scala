package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming ingestion guards for a training-data corpus:
  * the streaming twins of the batch curation ops, for the arrival
  * path where shards land continuously and duplicates should be
  * flagged BEFORE they reach the corpus.
  */
object IngestStreams {

  /** Streaming near-dup detection of arriving documents against a
    * PERSISTED MinHash index — the streaming twin of
    * [[Dedup.minhashNewVsIndexExact]]. Each micro-batch computes its
    * documents' band keys map-side (the same md5 family, pure column
    * arithmetic) and stream-static joins the index's band buckets;
    * collisions are verified with exact n-gram Jaccard and emitted as
    * (new_id, matched_id, jaccard, ts) append-mode rows.
    *
    * State design: the stream-static join itself is STATELESS (the
    * static side is just re-read per micro-batch and broadcast/hash
    * joined), so the only state is the
    * `dropDuplicatesWithinWatermark` pair-emission guard — a doc
    * colliding with the same index entry in several bands (or across
    * restarts within the watermark horizon) emits once. State is
    * bounded by pairs per watermark horizon, the same contract as
    * [[EventStreams.dedupeWithinWatermark]].
    *
    * `newDocs` must be a streaming DataFrame with (idCol, textCol,
    * tsCol); `index` is a batch DataFrame (idCol, textCol) — in
    * production the banded form would be precomputed and persisted;
    * deriving it here keeps the two sides' hash family provably
    * identical.
    */
  def dedupAgainstIndex(
      newDocs: DataFrame,
      index: DataFrame,
      idCol: String,
      textCol: String,
      tsCol: String,
      shingleN: Int = 5,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.7,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    // static side: (band, band_hash, matched_id, text_b) — batch-only
    // joins, resolved once per micro-batch
    val (iBase, iBanded) =
      Dedup.exactBandKeys(index, idCol, textCol, shingleN, numHashes, bands)
    val indexSide = iBanded
      .join(iBase.select(col("id"), col("text").as("text_b")), "id")
      .select(col("id").as("matched_id"), col("text_b"),
        col("band"), col("band_hash"))
    // stream side: band keys computed map-side with text and ts
    // CARRIED through the explode (a payload-free join-back by id
    // would be a stream-stream join and need its own watermark state)
    val (_, nBanded) = Dedup.exactBandKeys(
      newDocs.select(col(idCol), col(textCol).as("text_a"),
        col(textCol), col(tsCol).as("ts")),
      idCol, textCol, shingleN, numHashes, bands,
      carryCols = Seq("text_a", "ts"))
    nBanded
      .join(indexSide, Seq("band", "band_hash"))
      .select(col("id").as("new_id"), col("matched_id"),
        Dedup.ngramJaccard(col("text_a"), col("text_b"), shingleN)
          .as("jaccard"),
        col("ts"))
      .filter(col("jaccard") >= threshold)
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("new_id", "matched_id")
  }
}
