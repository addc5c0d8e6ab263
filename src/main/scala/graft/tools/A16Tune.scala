package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch probe: a16 WindowExec sort-path tuning — AQE on/off ×
  * shuffle-partition counts. The join-form alternative lost to the
  * sort on the regenerated sf10 (tools/A16Probe, r7), so the remaining
  * lever is the exchange/sort configuration itself. Not part of the
  * driver contract.
  */
object A16Tune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/tmp/sf10")
    for (aqe <- Seq("false"); parts <- Seq("16", "24", "32", "48")) {
      val spark = SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.shuffle.compress", "false")
        .config("spark.shuffle.spill.compress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      spark.conf.set(graft.plans.FramelessWindowStrategy.EnabledKey, "false")
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      def q() = li.select(col("l_orderkey"), col("l_linenumber"),
        count(lit(1)).over(Window.partitionBy(col("l_orderkey"))).as("cnt"))
        .write.format("noop").mode("overwrite").save()
      q(); System.gc()
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); q(); (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE aqe=$aqe parts=$parts: min=${runs.min}%.3f avg=${runs.sum / 3}%.3f")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
