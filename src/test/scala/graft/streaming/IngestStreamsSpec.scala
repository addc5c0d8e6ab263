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
}
