package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: split bench time into plan-construction vs execution. */
object OverheadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    val defs = graft.SparkEntry.benchQueries
    defs.foreach { q =>
      try q.impl(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    defs.foreach { q =>
      // plan construction (spark.read + DataFrame building) alone
      val c0 = System.nanoTime()
      val df = q.impl(spark, sfDir)
      val cT = (System.nanoTime() - c0) / 1e9
      // execution of a prebuilt df
      df.write.format("noop").mode("overwrite").save()
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"OVH ${q.name}: construct=$cT%.3f exec=${runs.min}%.3f")
    }
    spark.stop()
  }
}
