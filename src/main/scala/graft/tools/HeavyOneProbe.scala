package graft.tools

import org.apache.spark.sql.SparkSession

/** Time one (or more) bench-heavy queries by name without paying the
  * full suite — rolling-best calibration for new rows.
  * Args: name [name ...]; SPARK_GRAFT_SF_DIR selects the tier.
  */
object HeavyOneProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: HeavyOneProbe <queryName> [more...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      // session config matches graft.Bench exactly; NOTE when
      // calibrating rolling-bests, list each query TWICE — in the bench
      // JVM a row is timed after the full-suite warmup has JIT-compiled
      // the kernels and heated the page cache, so only the second
      // occurrence here is comparable (r13: first-cycle x03 read 16 s
      // vs 4.5 s same-JVM second cycle)
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
    val all = graft.SparkEntry.benchHeavyQueries ++ graft.SparkEntry.benchQueries
    args.foreach { name =>
      val q = all.find(_.name == name).getOrElse(
        sys.error(s"unknown bench query: $name"))
      try q.impl(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"[one] warm $name failed: $e") }
      System.gc()
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        q.impl(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[one] $name: min=${runs.min}%.3f all=${runs.map(r => f"$r%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
