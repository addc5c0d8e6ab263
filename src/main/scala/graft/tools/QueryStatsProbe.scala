package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicLong

/** Band-immune structural accounting for any bench query: shuffle
  * read/write bytes, spill, job/stage counts, summed task time — the
  * counts are deterministic in the plan, unlike wall time on this
  * bimodal VM (SCALE.md r12/r13). One warm cycle (JIT + artifact
  * build), then N measured cycles.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.QueryStatsProbe x12_tokenize_pack x15_ingest_pipeline"
  */
object QueryStatsProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryStatsProbe <queryName> [more...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cycles = sys.env.getOrElse("QSTATS_CYCLES", "2").toInt
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
    val shufW = new AtomicLong(0L); val shufR = new AtomicLong(0L)
    val spillD = new AtomicLong(0L); val taskMs = new AtomicLong(0L)
    val jobs = new AtomicLong(0L); val stages = new AtomicLong(0L)
    val inB = new AtomicLong(0L)
    val perStage = sys.env.get("QSTATS_STAGES").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        spillD.addAndGet(m.diskBytesSpilled)
        taskMs.addAndGet(m.executorRunTime)
        inB.addAndGet(m.inputMetrics.bytesRead)
        stages.incrementAndGet()
        if (perStage)
          println(f"[stage] id=${sc.stageInfo.stageId} tasks=${sc.stageInfo.numTasks} " +
            f"in=${m.inputMetrics.bytesRead / 1e6}%.1f " +
            f"sw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%.1f " +
            f"sr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%.1f " +
            f"task_s=${m.executorRunTime / 1e3}%.1f " +
            sc.stageInfo.name.takeWhile(_ != '\n').take(90))
      }
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    val all = graft.SparkEntry.benchHeavyQueries ++ graft.SparkEntry.benchQueries
    args.foreach { name =>
      val q = all.find(_.name == name).getOrElse(
        sys.error(s"unknown bench query: $name"))
      try q.impl(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"[qstats] warm $name failed: $e") }
      (1 to cycles).foreach { c =>
        System.gc(); Thread.sleep(500)
        shufW.set(0); shufR.set(0); spillD.set(0); taskMs.set(0)
        jobs.set(0); stages.set(0); inB.set(0)
        val t0 = System.nanoTime()
        q.impl(spark, sfDir).write.format("noop").mode("overwrite").save()
        val w = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"[qstats] $name cycle $c: wall=$w%.3f " +
          f"input=${inB.get / 1e6}%.1fMB shufW=${shufW.get / 1e6}%.1fMB " +
          f"shufR=${shufR.get / 1e6}%.1fMB spill=${spillD.get / 1e6}%.1fMB " +
          f"taskSec=${taskMs.get / 1e3}%.1f jobs=${jobs.get} stages=${stages.get}")
      }
    }
    spark.stop()
  }
}
