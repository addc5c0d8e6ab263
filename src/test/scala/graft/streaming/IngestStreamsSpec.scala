package graft.streaming

import java.sql.Timestamp

import graft.SparkFixture
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class IngestStreamsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def t(s: String) = Timestamp.valueOf(s)

  test("streaming dedup flags arriving near-dups against the static index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val index = Seq(
      (10L, base),
      (11L, "a completely different indexed document about query engines"))
      .toDF("doc_id", "text")
    val input = MemoryStream[(Long, String, Timestamp)]
    val stream = input.toDF().toDF("doc_id", "text", "ts")
    val query = IngestStreams.dedupAgainstIndex(stream, index,
        "doc_id", "text", "ts", threshold = 0.5)
      .writeStream.format("memory").queryName("graft_ingest_dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, base, t("2026-01-01 10:00:00")),                   // exact dup
        (2L, base.replace("dog", "cat"), t("2026-01-01 10:00:01")), // near dup
        (3L, "unrelated fresh content nothing shared here at all",
          t("2026-01-01 10:00:02")))
      query.processAllAvailable()
      // a multi-band collider must emit ONCE despite 16 band collisions
      input.addData((1L, base, t("2026-01-01 10:01:00"))) // cross-batch replay
      query.processAllAvailable()
      val rows = spark.sql(
          "SELECT new_id, matched_id, jaccard FROM graft_ingest_dedup")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(rows.count(r => r._1 == 1L && r._2 == 10L) == 1)
      assert(rows.exists(r => r._1 == 2L && r._2 == 10L && r._3 >= 0.5))
      assert(!rows.exists(_._1 == 3L))
      assert(!rows.exists(_._2 == 11L))
      val exact = rows.find(r => r._1 == 1L && r._2 == 10L).get
      assert(exact._3 == 1.0)
    } finally query.stop()
  }

  test("the rule gate composes with a document stream unchanged (map-only)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val query = graft.ops.Curation.gopherRules(
        input.toDF().toDF("doc_id", "text", "lang"),
        "doc_id", "text", "lang", minTokens = 3)
      .writeStream.format("memory").queryName("graft_rules_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, "the quick brown fox", "en"), (2L, "to in", "en"))
      query.processAllAvailable()
      val rows = spark.sql(
          "SELECT doc_id, keep, drop_reason FROM graft_rules_stream")
        .collect().map(r => r.getLong(0) ->
          (r.getBoolean(1), Option(r.getString(2)))).toMap
      assert(rows(1L) == ((true, None)))
      assert(rows(2L) == ((false, Some("too_short"))))
    } finally query.stop()
  }

  test("pair-emission guard state survives a checkpoint restart") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val index = Seq((10L, base)).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest_ckpt").toString
    val src = s"$dir/src"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    new java.io.File(src).mkdirs()
    def writeDoc(file: String, id: Long, text: String, ts: String): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$src/$file"),
        s"""{"doc_id": $id, "text": "$text", "ts": "$ts"}""")
    val schema = "doc_id LONG, text STRING, ts TIMESTAMP"
    def start() = IngestStreams.dedupAgainstIndex(
        spark.readStream.schema(schema).json(src), index,
        "doc_id", "text", "ts", threshold = 0.5)
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt).option("path", out)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    writeDoc("b1.json", 1L, base, "2026-01-01 10:00:00")
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    // while DOWN: the same pair arrives again (within the watermark
    // horizon) plus a genuinely new near-dup
    writeDoc("b2.json", 1L, base, "2026-01-01 10:01:00")
    writeDoc("b3.json", 4L, base.replace("dog", "cat"), "2026-01-01 10:01:30")
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("matched_id")))
    assert(rows.count(_ == ((1L, 10L))) == 1) // restored state deduped the replay
    assert(rows.count(_ == ((4L, 10L))) == 1)
    assert(rows.length == 2)
  }

  test("streaming asof enrichment: each event gets the dimension version in effect") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // versioned dimension: key 1 has versions at t=10 and t=20; key 2 at t=50
    val dim = Seq((1L, 10L, "v1a"), (1L, 20L, "v1b"), (2L, 50L, "v2a"))
      .toDF("key", "vt", "cfg")
    val input = MemoryStream[(Long, Long, Double)]
    val stream = input.toDF().toDF("key", "t", "x")
    val query = IngestStreams.asofEnrichStatic(stream, dim, "key", "t", "vt")
      .writeStream.format("memory").queryName("graft_asof_enrich")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, 5L, 0.1),  // before any version -> null cfg
        (1L, 10L, 0.2), // exactly at v1a (>= semantics)
        (1L, 15L, 0.3), // between versions -> v1a
        (1L, 99L, 0.4), // after both -> v1b
        (2L, 49L, 0.5), // before key 2's only version -> null
        (3L, 99L, 0.6)) // key with no dimension at all -> null
      query.processAllAvailable()
      val got = spark.sql("SELECT t, key, cfg FROM graft_asof_enrich")
        .collect().map(r => (r.getLong(1), r.getLong(0)) -> Option(r.getString(2))).toMap
      assert(got == Map(
        (1L, 5L) -> None, (1L, 10L) -> Some("v1a"), (1L, 15L) -> Some("v1a"),
        (1L, 99L) -> Some("v1b"), (2L, 49L) -> None, (3L, 99L) -> None))
    } finally query.stop()
  }
}
