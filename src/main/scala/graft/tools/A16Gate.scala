package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints which physical form a16 takes at a given sf dir (gate check:
  * WindowExec below the stats threshold, HashFramelessWindowExec above).
  */
object A16Gate {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.FramelessWindowStrategy.install(spark)
    val plan = graft.SparkEntry.queries("a16_window_count")(spark, d)
      .queryExecution.executedPlan.toString
    val form =
      if (plan.contains("HashFramelessWindow")) "HashFramelessWindowExec"
      else if (plan.contains("Window")) "WindowExec"
      else "unknown"
    println(s"PROBE a16 form at $d: $form")
    spark.stop()
  }
}
