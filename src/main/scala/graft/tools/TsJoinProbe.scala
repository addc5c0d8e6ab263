package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-7 time-series joins (a41 asof, a42 range):
  * times both on Amplify-derived event relations so SCALE.md records
  * how the one-shuffle shapes grow with user-disjoint volume.
  *
  * Usage: runMain graft.tools.TsJoinProbe [sfDir] [factors]
  */
object TsJoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("10,100").split(",").map(_.toInt)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (f <- factors) {
      val dir = new java.io.File(
        sys.props("java.io.tmpdir"), s"graft_events_x$f.parquet")
      if (!dir.exists())
        Amplify.events(graft.Tables.events(spark, sfDir), f)
          .repartition(spark.sparkContext.defaultParallelism)
          .write.mode("overwrite").parquet(dir.getAbsolutePath)
      val e = spark.read.parquet(dir.getAbsolutePath)
      val n = e.count()
      def asof() = {
        val clicks = e.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val errors = e.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts").as("__rt"),
            col("ts").as("err_ts"), col("event_id").as("err_id"),
            col("value").as("err_value"))
        graft.ops.ScalableOps.asofJoinBackward(
            clicks, errors, Seq("user_id"), "ts", "__rt")
          .write.format("noop").mode("overwrite").save()
      }
      def range() = {
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"),
            unix_micros(col("ts").cast("timestamp")).as("c_us"))
        val errs = e.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id").as("err_id"),
            unix_micros(col("ts").cast("timestamp")).as("start_us"),
            (unix_micros(col("ts").cast("timestamp")) + 300000000L).as("end_us"))
        graft.ops.ScalableOps.rangeJoinBinned(
            clicks, errs, Seq("user_id"), "c_us", "start_us", "end_us",
            binWidth = 300000000L)
          .groupBy(col("err_id")).agg(count(lit(1)).as("n"))
          .write.format("noop").mode("overwrite").save()
      }
      asof(); range() // warm-up
      val tAsof = (1 to 3).map(_ => time(asof())).min
      val tRange = (1 to 3).map(_ => time(range())).min
      println(f"PROBE tsjoin x$f%d n=$n%d asof=$tAsof%.2f s range=$tRange%.2f s")
    }
    spark.stop()
  }
}
