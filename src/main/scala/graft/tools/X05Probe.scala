package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B probe for the x05 line-dedup rewrite (keys-only shuffle vs the
  * r7 exploded-text shuffles). Runs the registered x05 QueryDef at the
  * given sf dir, best-of-3, and prints the executed plan's exchange
  * count so SCALE.md records both the number and the mechanism.
  *
  * Usage: runMain graft.tools.X05Probe [sfDir]
  */
object X05Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.queries.BenchHeavy.queries.find(_.name == "x05_line_dedup").get
    def run(): Double = {
      System.gc()
      val t0 = System.nanoTime()
      q.impl(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warm-up (also materializes the amplified corpus dir)
    val best = (1 to 3).map(_ => run()).min
    val df = q.impl(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    val nEx = "Exchange".r.findAllIn(plan).length
    println(f"PROBE x05 best=$best%.3f s exchanges=$nEx")
    if (sys.env.contains("PROBE_EXPLAIN")) println(plan)
    spark.stop()
  }
}
