package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch plan inspector (not part of the driver contract). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.SparkEntry.queries(sys.env.getOrElse("PROBE_QUERY", "a06_join_agg"))
    val df = q(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    println("=== FORMATTED PLAN ===")
    // materialize final adaptive plan by re-executing and printing explain
    df.explain("formatted")
    spark.stop()
  }
}
