package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch perf probe (not part of the driver contract): runs the real
  * bench subset under env-driven session configs so static-conf combos
  * (AQE, shuffle compression, local dir) can be A/B'd across JVMs.
  */
object BenchGrid {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    var b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRID_PARTS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRID_AQE", "true"))
      .config("spark.shuffle.compress",
        sys.env.getOrElse("GRID_SHUF_COMPRESS", "true"))
      .config("spark.shuffle.spill.compress",
        sys.env.getOrElse("GRID_SHUF_COMPRESS", "true"))
      .config("spark.ui.enabled", "false")
    sys.env.get("GRID_LOCAL_DIR").foreach(d => b = b.config("spark.local.dir", d))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val defs = graft.SparkEntry.benchQueries
    defs.foreach { q =>
      try q.impl(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    var total = 0.0
    defs.foreach { q =>
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        q.impl(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      total += runs.min
      println(f"GRID ${q.name}: ${runs.min}%.3f")
    }
    println(f"GRID total: $total%.3f")
    spark.stop()
  }
}
