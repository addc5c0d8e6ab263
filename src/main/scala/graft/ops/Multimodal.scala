package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque BINARY payloads with
  * typed metadata, processed in partition-local batches.
  *
  * The actual codec work (image decode, audio resample, frame
  * extraction) requires native libraries that are OUT OF SCOPE in this
  * environment — `decodeStub` below is a clearly-marked deterministic
  * FAKE. Everything around it — the schema, the binary payload
  * handling, the partition-batched mapPartitions shape, and the
  * metadata struct — is the real distributed plumbing a decoder would
  * plug into (swap `fakeDecode` for the real library call).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("codec", StringType, nullable = true))), nullable = true)))

  /** Build a media table from the documents table: payload = UTF-8
    * bytes of the text (a stand-in for real image/audio bytes), kind
    * round-robins over modalities, metadata derived deterministically.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        (col("doc_id") % 640 + 1).cast("int").as("width"),
        (col("doc_id") % 480 + 1).cast("int").as("height"),
        (col("n_chars") * 10).cast("long").as("duration_ms"),
        lit("fake/1").as("codec")).as("meta"))

  // public: Catalyst's generated (de)serializer code must access these
  case class MediaIn(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long, checksum: Long,
      feature: Array[Double])

  /** STUB: deterministic fake "decode + feature extraction". A real
    * implementation would replace the body of `fakeDecode` with the
    * native codec call; the partition-batched iterator shape (no
    * per-row JNI setup, bounded memory) is the part under test.
    */
  private def fakeDecode(payload: Array[Byte]): Array[Double] = {
    // ??? real codec goes here — fake: 4-bin byte histogram, normalized
    val bins = new Array[Double](4)
    if (payload != null) {
      var i = 0
      while (i < payload.length) {
        bins((payload(i) & 0xff) / 64) += 1.0
        i += 1
      }
      val total = payload.length.max(1).toDouble
      var b = 0
      while (b < 4) { bins(b) = bins(b) / total; b += 1 }
    }
    bins
  }

  /** Decode/extract features over media rows, batched per partition.
    *
    * Typed `Dataset.mapPartitions`, not an `.rdd` exit: the object
    * boundary stays inside the Catalyst plan (Deserialize/Serialize
    * nodes the planner and AQE can see), lineage is preserved for
    * re-optimization, and the iterator-per-partition shape is exactly
    * where a native codec binds (one library handle per task, not per
    * row).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[MediaIn]
      .mapPartitions { rows =>
        rows.map { m =>
          val nBytes = if (m.payload == null) 0L else m.payload.length.toLong
          var checksum = 0L
          if (m.payload != null) {
            var i = 0
            while (i < m.payload.length) {
              checksum = checksum * 31 + (m.payload(i) & 0xff); i += 1
            }
          }
          MediaFeatures(m.media_id, m.kind, nBytes, checksum, fakeDecode(m.payload))
        }
      }
      .toDF()
  }

  /** Deterministic frame sampling: slice the payload into fixed-size
    * "frames" and keep every `everyN`-th — the distributed shape of
    * video frame extraction (explode → per-frame rows).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, everyN: Int): DataFrame =
    media
      .select(col("media_id"), col("kind"),
        posexplode(split(base64(col("payload")), s"(?<=\\G.{${4 * frameBytes}})")))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame_b64")
      .filter(col("frame_no") % everyN === 0 && length(col("frame_b64")) > 0)
}
