package graft.streaming

import graft.SparkFixture
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class EventStreamsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("windowed type counts aggregate incrementally across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val query = EventStreams.runWindowedDemo(spark, df, "graft_stream_test")
    try {
      val t0 = Timestamp.valueOf("2026-01-01 10:00:10")
      val t1 = Timestamp.valueOf("2026-01-01 10:00:50")
      val t2 = Timestamp.valueOf("2026-01-01 10:01:10")
      input.addData((t0, "click", 1.0), (t1, "click", 2.0), (t1, "view", 5.0))
      query.processAllAvailable()
      input.addData((t2, "click", 10.0))
      query.processAllAvailable()
      val out = spark.sql("SELECT * FROM graft_stream_test")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
        .sortBy(x => (x._1, x._2))
      assert(out.toSeq == Seq(
        ("2026-01-01 10:00:00.0", "click", 2L, 3.0),
        ("2026-01-01 10:00:00.0", "view", 1L, 5.0),
        ("2026-01-01 10:01:00.0", "click", 1L, 10.0)))
    } finally query.stop()
  }

  test("stateful user sessions accumulate across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double, String)]
    val sessions = EventStreams.userSessions(input.toDS())
    val query = sessions.writeStream
      .format("memory").queryName("graft_sessions_test")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData((1L, 2.0, "click"), (1L, 3.0, "view"), (2L, 7.0, "click"))
      query.processAllAvailable()
      input.addData((1L, 5.0, "click"))
      query.processAllAvailable()
      val last = spark.sql(
        "SELECT user_id, max(n_events) AS n, max(total_value) AS v FROM graft_sessions_test GROUP BY user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
      assert(last.toSeq == Seq((1L, 3L, 10.0), (2L, 1L, 7.0)))
    } finally query.stop()
  }

  test("batch events table runs through the same windowed aggregation") {
    // same logical op applied to the static driver events table
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val out = events
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(out.count() > 0)
  }

  test("streaming dedup within watermark drops duplicates across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val df = input.toDF().toDF("event_id", "ts", "value")
    val query = EventStreams.dedupeWithinWatermark(df, Seq("event_id"), "10 minutes")
      .writeStream.format("memory").queryName("graft_dedup_test")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      input.addData((1L, t("2026-01-01 10:00:00"), 1.0),
        (1L, t("2026-01-01 10:00:05"), 2.0), // in-batch dup
        (2L, t("2026-01-01 10:01:00"), 3.0))
      query.processAllAvailable()
      input.addData((1L, t("2026-01-01 10:02:00"), 4.0)) // cross-batch dup
      query.processAllAvailable()
      val ids = spark.sql("SELECT event_id FROM graft_dedup_test")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L))
    } finally query.stop()
  }

  test("sessionize merges a late overlapping event and extends session start") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    // generous watermark delay so the late event is NOT dropped
    val withWm = input.toDS().withWatermark("_2", "2 hours")
      .as[(Long, Timestamp, Double)]
    val query = EventStreams.sessionize(withWm, gap = "10 minutes")
      .writeStream.format("memory").queryName("graft_sessionize_late")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      input.addData((1L, t("2026-01-01 10:10:00"), 1.0))
      query.processAllAvailable()
      // late event 6 min BEFORE the open session start: windows overlap
      // → merge, session_start extends back to 10:04
      input.addData((1L, t("2026-01-01 10:04:00"), 2.0))
      query.processAllAvailable()
      // far-future event for another user pushes the watermark past
      // 10:10+10min+2h so user 1's session times out and is emitted
      input.addData((2L, t("2026-01-01 13:00:00"), 0.0))
      query.processAllAvailable()
      input.addData((2L, t("2026-01-01 13:01:00"), 0.0))
      query.processAllAvailable()
      val rows = spark.sql(
        "SELECT * FROM graft_sessionize_late WHERE user_id = 1").collect()
        .map(r => (r.getTimestamp(1).toString, r.getTimestamp(2).toString, r.getLong(3)))
      assert(rows.toSeq == Seq(("2026-01-01 10:04:00.0", "2026-01-01 10:10:00.0", 2L)))
    } finally query.stop()
  }

  test("sessionize rejects month-bearing gaps") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException](
      EventStreams.sessionize(
        spark.emptyDataset[(Long, Timestamp, Double)], gap = "1 month"))
    assert(e.getMessage.contains("months"))
  }

  test("event-time sessionization closes sessions as the watermark passes gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val withWm = input.toDS().withWatermark("_2", "0 seconds")
      .as[(Long, Timestamp, Double)]
    val sessions = EventStreams.sessionize(withWm, gap = "10 minutes")
    val query = sessions.writeStream
      .format("memory").queryName("graft_sessionize_test")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      // user 1: two events inside one session
      input.addData((1L, t("2026-01-01 10:00:00"), 1.0),
        (1L, t("2026-01-01 10:05:00"), 2.0))
      query.processAllAvailable() // watermark → 10:05
      // user 2 far in the future advances the watermark past 10:15
      input.addData((2L, t("2026-01-01 11:00:00"), 5.0))
      query.processAllAvailable() // watermark → 11:00 (after batch)
      // next batch fires user 1's EventTimeTimeout (10:15 < 11:00)
      input.addData((3L, t("2026-01-01 11:01:00"), 1.0))
      query.processAllAvailable()
      val out = spark.sql("SELECT * FROM graft_sessionize_test").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3), r.getDouble(4)))
      assert(out.toSeq == Seq(
        (1L, "2026-01-01 10:00:00.0", "2026-01-01 10:05:00.0", 2L, 3.0)))

      // an in-batch gap closes the old session inline (no timeout needed)
      input.addData((3L, t("2026-01-01 12:00:00"), 4.0))
      query.processAllAvailable()
      input.addData((9L, t("2026-01-01 13:00:00"), 0.0))
      query.processAllAvailable()
      input.addData((9L, t("2026-01-01 13:30:00"), 0.0))
      query.processAllAvailable()
      val out2 = spark.sql(
        "SELECT * FROM graft_sessionize_test WHERE user_id = 3").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(3)))
        .sortBy(_._2)
      // user 3's 11:01 session closed (via inline gap or timeout)
      assert(out2.nonEmpty &&
        out2.head == ((3L, "2026-01-01 11:01:00.0", 1L)))
    } finally query.stop()
  }

  test("interval join pairs clicks with in-window errors across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val errors = MemoryStream[(Long, Long, Timestamp)]
    def df(m: MemoryStream[(Long, Long, Timestamp)]) =
      m.toDF().toDF("event_id", "user_id", "ts")
    val query = EventStreams.intervalJoinPairs(df(clicks), df(errors),
        gapSeconds = 300L, watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("graft_ij_test")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      clicks.addData((1L, 10L, t("2026-01-01 10:00:00")))
      query.processAllAvailable()
      // errors arrive in a LATER micro-batch — the click is held in
      // join state and still pairs (the stateful point of the op)
      errors.addData(
        (100L, 10L, t("2026-01-01 10:03:00")), // in window
        (101L, 10L, t("2026-01-01 10:05:00")), // boundary: half-open, out
        (102L, 99L, t("2026-01-01 10:03:00"))) // other user
      query.processAllAvailable()
      val out = spark.sql("SELECT click_id, err_id, lag_us FROM graft_ij_test")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
      assert(out == Seq((1L, 100L, 180000000L)))
    } finally query.stop()
  }

  test("interval join batch twin matches a hand-derived pair set") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val clicks = Seq((1L, 10L, t("2026-01-01 10:00:00")),
      (2L, 10L, t("2026-01-01 10:10:00")),
      (3L, 20L, t("2026-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val errors = Seq((100L, 10L, t("2026-01-01 10:02:00")),
      (101L, 10L, t("2026-01-01 10:12:00")),
      (102L, 20L, t("2026-01-01 09:59:59")), // before the click
      (103L, 30L, t("2026-01-01 10:01:00")))
      .toDF("event_id", "user_id", "ts")
    val out = EventStreams.intervalJoinPairs(clicks, errors, gapSeconds = 300L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(out == Seq((1L, 100L, 120000000L), (2L, 101L, 120000000L)))
  }
}
