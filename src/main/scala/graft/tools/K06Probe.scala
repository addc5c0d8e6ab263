package graft.tools

import org.apache.spark.sql.SparkSession

/** Split k06's wall time into plan-construction (catalog resolution +
  * analysis) vs execution, to adjudicate the r14 k06/k08 suspect flags
  * (0.34–0.64 s vs the 0.184 committed constant while the flat Layer-A
  * rows sat at all-time bests in the same record — pointing at
  * catalog/driver overhead, not executor work).
  */
object K06Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.ui.enabled", "false")
    val spark = graft.BucketedTables.configure(builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.FramelessWindowStrategy.install(spark)
    val quartet = graft.BucketedTables.queries.filter(q =>
      Set("k06_bucketed_join_agg", "k08_bucketed_self_join",
        "k16_bucketed_window_count", "k19_bucketed_rank_frame")(q.name))
    graft.BucketedTables.ensure(spark, sfDir)
    quartet.foreach { q =>
      try q.impl(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"[k06probe] warm ${q.name}: $e") }
    }
    (1 to 3).foreach { round =>
      quartet.foreach { q =>
        System.gc()
        val t0 = System.nanoTime()
        val df = q.impl(spark, sfDir)
        df.queryExecution.executedPlan // force analysis+planning
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        println(f"[k06probe] r$round ${q.name}: plan=${(t1 - t0) / 1e9}%.3f exec=${(t2 - t1) / 1e9}%.3f total=${(t2 - t0) / 1e9}%.3f")
      }
    }
    spark.stop()
  }
}
