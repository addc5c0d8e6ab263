package graft.tools

import org.apache.spark.sql.SparkSession

/** sf1 scheduling-floor decomposition (r13 verdict #4): how much of
  * the sf1 flat Layer-A total is per-query fixed cost (driver
  * planning + job/stage scheduling + task dispatch) rather than data
  * work? Three measurements in ONE JVM so the box's bimodal band
  * cancels out of the ratios:
  *
  *   1. empty-job floor: noop-write of a 1-row range, best-of-20 —
  *      the irreducible job cost;
  *   2. per-query plan floor: the same 7 Layer-A queries on sf0.001
  *      (~600 lineitem rows — identical plans, negligible data);
  *   3. the sf1 tier itself.
  *
  * (2) − (1) is per-query planning/analysis cost; (3) − (2) is the
  * actual 6M-row work term, the only part a 1000-executor cluster
  * scales. DuckDB's floor on the same box is ~1 ms/query, which is
  * the whole story of the sf1 flat gap; the committed remedy for the
  * exchange-bound rows is the bucketed quartet (0.9 s at sf1 in the
  * r14 record vs 3.0 flat).
  *
  * Usage: runMain graft.tools.FloorProbe [sf1Dir] [tinyDir]
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sf1 = args.lift(0).getOrElse(
      "/tmp/graft_bench_sf1__root_testdata_sf0_1")
    val tiny = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.FramelessWindowStrategy.install(spark)
    val layerA = graft.SparkEntry.benchQueries
    def once(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // (1) empty-job floor
    (1 to 5).foreach(_ => spark.range(1).write.format("noop").mode("overwrite").save())
    val empty = (1 to 20).map(_ => once(
      spark.range(1).write.format("noop").mode("overwrite").save())).min
    println(f"[floor] empty_job_best=$empty%.4f s")
    // (2) tiny-data plans, (3) sf1 — interleaved per query so a band
    // shift hits both terms of each query's difference equally
    var tinyTotal = 0.0
    var sf1Total = 0.0
    layerA.foreach { q =>
      try q.impl(spark, tiny).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      try q.impl(spark, sf1).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      System.gc()
      val tt = (1 to 3).map(_ =>
        once(q.impl(spark, tiny).write.format("noop").mode("overwrite").save())).min
      val ts = (1 to 3).map(_ =>
        once(q.impl(spark, sf1).write.format("noop").mode("overwrite").save())).min
      tinyTotal += tt; sf1Total += ts
      println(f"[floor] ${q.name}: tiny=$tt%.3f sf1=$ts%.3f work=${ts - tt}%.3f")
    }
    println(f"[floor] totals: empty7=${empty * 7}%.3f tiny=$tinyTotal%.3f " +
      f"sf1=$sf1Total%.3f work_term=${sf1Total - tinyTotal}%.3f")
    spark.stop()
  }
}
