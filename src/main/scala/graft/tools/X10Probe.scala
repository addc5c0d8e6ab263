package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** x10 variance probe (r9): the round's first Bench run recorded
  * x10_image_dhash at 12.1 s where the second (and the r9 SCALE
  * quiet-box number) sit at ~3.3 s — AFTER an untimed warm-up pass,
  * with best-of-2 + the >25%-disagreement extra rep. This drives the
  * identical workload N times in one JVM and prints every sample, to
  * separate "intrinsic decode variance" (JIT/GC state) from "ambient
  * box load" (which per-sample times can't show but their spread can).
  */
object X10Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(6)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.queries.BenchHeavy.queries
      .find(_.name == "x10_image_dhash").get
    for (i <- 1 to reps) {
      System.gc()
      val t0 = System.nanoTime()
      q.impl(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[x10probe] sample $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
