package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque BINARY payloads with
  * typed metadata, processed in partition-local batches.
  *
  * IMAGE payloads are decoded for real (kernel/ImageCodec.scala —
  * `javax.imageio`, pure JDK: PNG/JPEG/GIF/BMP → dimensions + channel
  * means; pinned end-to-end by l21's generative oracle). Audio/video
  * codec work requires native libraries that are OUT OF SCOPE in this
  * environment — `fakeDecode` below is the clearly-marked
  * deterministic FALLBACK for those kinds (and for undecodable image
  * bytes). Everything around it — the schema, the binary payload
  * handling, the partition-batched mapPartitions shape, and the
  * metadata struct — is the real distributed plumbing a real codec
  * binds into (one codec setup per task, not per row).
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
      width: Option[Int], height: Option[Int],
      mean_r: Option[Double], mean_g: Option[Double], mean_b: Option[Double],
      feature: Array[Double])

  /** STUB for the kinds the JDK has no codec for (audio/video), and
    * the fallback for undecodable image bytes. A real implementation
    * would replace this body with the native codec call; the
    * partition-batched iterator shape (no per-row JNI setup, bounded
    * memory) is the part under test.
    */
  private def fakeDecode(payload: Array[Byte]): Array[Double] = {
    // ??? real audio/video codec goes here — fake: normalized 4-bin byte histogram
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
          val img =
            if (m.kind == "image") graft.kernel.ImageCodec.decode(m.payload)
            else None
          img match {
            case Some(d) =>
              MediaFeatures(m.media_id, m.kind, nBytes, checksum,
                Some(d.width), Some(d.height),
                Some(d.meanR), Some(d.meanG), Some(d.meanB),
                Array(d.meanR / 255.0, d.meanG / 255.0, d.meanB / 255.0))
            case None =>
              MediaFeatures(m.media_id, m.kind, nBytes, checksum,
                None, None, None, None, None, fakeDecode(m.payload))
          }
        }
      }
      .toDF()
  }

  /** Deterministic PNG media table: one small image per documents row
    * (doc_id < limit), dimensions and every pixel channel a generative
    * formula of (id, x, y) — so l21's DuckDB oracle re-derives the
    * decoded features from the formula alone, without ever touching
    * PNG bytes, while the Spark side round-trips them through a REAL
    * encode (here) + decode (ImageCodec in extractFeatures). PNG is
    * lossless, so the two must agree exactly.
    */
  def syntheticImages(docs: DataFrame, limit: Long): DataFrame = {
    val mk = udf((id: Long) => {
      val w = (2 + id % 7).toInt
      val h = (2 + id % 5).toInt
      graft.kernel.ImageCodec.encodePng(w, h, (x, y) => {
        val r = ((id * 7 + x * 13 + y * 31) % 256).toInt
        val g = ((id * 11 + x * 17 + y * 5) % 256).toInt
        val b = ((id * 3 + x * 29 + y * 23) % 256).toInt
        (r << 16) | (g << 8) | b
      })
    })
    docs.filter(col("doc_id") < limit)
      .select(col("doc_id").as("media_id"), lit("image").as("kind"),
        mk(col("doc_id")).as("payload"))
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
