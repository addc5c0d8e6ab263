package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named queries to files — the
  * committed plan evidence under plans/<round>/ (optimization-round
  * deliverable). Session config mirrors graft.Bench exactly so the
  * dumped plan is the one the bench actually executes; each query is
  * evaluated to the noop sink first so AQE's final plan (coalesced
  * reads, runtime join rewrites) is what prints, not the initial one.
  *
  * Usage: PLAN_OUT_DIR=plans/r14 PLAN_TAG=after \
  *          sbt "runMain graft.tools.PlanDump x11_pagerank y09_bm25_topk_500k"
  * Names resolve across the full registry: oracle rows, bench rows,
  * heavy rows. SPARK_GRAFT_SF_DIR selects the tier (default sf0.1).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <queryName> [more...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("PLAN_OUT_DIR", "plans/r14")
    val tag = sys.env.getOrElse("PLAN_TAG", "after")
    val builder0 = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.ui.enabled", "false")
    val spark = graft.BucketedTables.configure(builder0).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.FramelessWindowStrategy.install(spark)
    val heavy = graft.SparkEntry.benchHeavyQueries
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    args.foreach { name =>
      val impl: (SparkSession, String) => org.apache.spark.sql.DataFrame =
        heavy.find(_.name == name).map(_.impl)
          .orElse(graft.SparkEntry.queries.get(name))
          .getOrElse(sys.error(s"unknown query: $name"))
      val df = impl(spark, sfDir)
      try df.write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"[plan] exec $name failed: $e") }
      // Re-instantiate so the printed plan is fresh (some impls cache
      // side artifacts on first run — the second plan is the steady
      // serving-path one the bench times).
      val df2 = impl(spark, sfDir)
      val txt =
        try df2.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"explain failed: $e" }
      val p = java.nio.file.Paths.get(outDir, s"${name}_$tag.txt")
      java.nio.file.Files.write(p, txt.getBytes("UTF-8"))
      println(s"[plan] wrote $p (${txt.length} chars)")
    }
    spark.stop()
  }
}
