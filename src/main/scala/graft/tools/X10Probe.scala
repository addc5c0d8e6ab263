package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-bench-entry variance probe (r9; born as the x10 ImageIO
  * investigation — samples 4.25–8.54 s with ImageIO's per-decode
  * temp-file cache on, 1.1–1.6 s steady with it off). Drives ONE
  * named heavy/Layer-A bench query N times in one JVM and prints
  * every sample: separates intrinsic variance (JIT/GC state) from
  * ambient box load, and times new bench entries without a full
  * Bench run.
  *
  * Usage: runMain graft.tools.X10Probe [queryName] [reps]
  */
object X10Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = args.headOption.getOrElse("x10_image_dhash")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(6)
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
    val q = (graft.SparkEntry.benchHeavyQueries ++ graft.SparkEntry.benchQueries)
      .find(_.name == name)
      .getOrElse(sys.error(s"no bench query named $name"))
    for (i <- 1 to reps) {
      System.gc()
      val t0 = System.nanoTime()
      q.impl(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[x10probe] $name sample $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
