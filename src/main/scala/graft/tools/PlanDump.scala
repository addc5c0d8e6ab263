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
  *
  * PLAN_SEGMENTS=1 (r15, verdict r14 #8): additionally write
  * `<name>_<tag>_segments.txt` containing the formatted plan of EVERY
  * action the query ran (QueryExecutionListener) — checkpoint
  * materializations, persist-materializing counts, collects. For
  * iterative/checkpointed paths (x11, l12, x15) the final explain
  * shows only the post-truncation tail; the segment dump is the
  * committed evidence of the exchange structure the probes measure.
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
    val segMode = sys.env.get("PLAN_SEGMENTS").contains("1")
    val segments = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    if (segMode)
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit =
            segments.add(s"== action: $funcName " +
              f"(${durationNs / 1e9}%.3f s) ==\n" +
              (try qe.explainString(
                org.apache.spark.sql.execution.FormattedMode)
              catch { case e: Throwable => s"explain failed: $e" }))
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })
    args.foreach { name =>
      val impl: (SparkSession, String) => org.apache.spark.sql.DataFrame =
        heavy.find(_.name == name).map(_.impl)
          .orElse(graft.SparkEntry.queries.get(name))
          .getOrElse(sys.error(s"unknown query: $name"))
      segments.clear()
      val df = impl(spark, sfDir)
      try df.write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"[plan] exec $name failed: $e") }
      if (segMode) {
        // drain listener events queued on the shared bus before writing
        // (listenerBus is private[spark] — a bounded sleep is enough
        // for a single-process dump tool)
        Thread.sleep(1000)
        val segTxt = new StringBuilder()
        val it = segments.iterator()
        var i = 1
        while (it.hasNext) {
          segTxt.append(s"---------- segment $i ----------\n")
            .append(it.next()).append("\n")
          i += 1
        }
        val sp = java.nio.file.Paths.get(outDir, s"${name}_${tag}_segments.txt")
        java.nio.file.Files.write(sp, segTxt.toString.getBytes("UTF-8"))
        println(s"[plan] wrote $sp (${i - 1} segments)")
      }
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
