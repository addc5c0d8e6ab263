package graft.streaming

import java.sql.Timestamp

import graft.SparkFixture
import graft.ops.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** h09's streaming twin: the Misra–Gries TypedImperativeAggregate
  * under a streaming event-time window produces the same per-window
  * heavy-hitter counts the batch row computes (unsaturated regime =
  * exact) — proving the mergeable sketch state composes with
  * Structured Streaming's incremental aggregation.
  */
class HeavyHittersStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def t(s: String) = Timestamp.valueOf(s)

  private val rows = Seq(
    (t("2026-01-01 10:00:05"), "click"),
    (t("2026-01-01 10:00:10"), "click"),
    (t("2026-01-01 10:00:40"), "error"),
    (t("2026-01-01 10:01:10"), "click"),
    (t("2026-01-01 10:01:30"), "purchase"),
    (t("2026-01-01 10:01:50"), "purchase"))

  private val expected = Set(
    ("2026-01-01 10:00:00", "click", 2L),
    ("2026-01-01 10:00:00", "error", 1L),
    ("2026-01-01 10:01:00", "click", 1L),
    ("2026-01-01 10:01:00", "purchase", 2L))

  private def agg(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(window(col("ts"), "60 seconds"))
      .agg(Sketches.freqItems(col("event_type"), 64).as("fi"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
        .as("window_start"), expr("inline(fi)"))
      .select(col("window_start"), col("item").as("event_type"),
        col("count_min").as("n"))

  test("batch form matches the hand-computed counts") {
    import spark.implicits._
    val got = agg(rows.toDF("ts", "event_type"))
      .as[(String, String, Long)].collect().toSet
    assert(got == expected)
  }

  test("the same aggregate runs incrementally as a streaming window query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val query = agg(input.toDF().toDF("ts", "event_type"))
      .writeStream.format("memory").queryName("graft_hh_stream")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData(rows.take(3)) // first window arrives across batches
      query.processAllAvailable()
      input.addData(rows.drop(3))
      query.processAllAvailable()
      val got = spark.sql(
          "SELECT window_start, event_type, n FROM graft_hh_stream")
        .as[(String, String, Long)].collect().toSet
      assert(got == expected)
    } finally query.stop()
  }
}
