package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicLong

/** Shuffle/job accounting for the x11 PageRank iteration loop —
  * band-immune evidence (bytes and counts are deterministic in the
  * plan, unlike wall on this bimodal VM). The question under test:
  * does each iteration exchange the EDGE list (the largest relation)
  * on its way into the contributions join, or only the id-sized
  * contribution/rank rows? The GraphRank scaladoc claims one shuffle
  * per iteration; if edgesW's at-rest partitioning does not match the
  * join key hash(src), Catalyst silently re-exchanges edges 5×.
  */
object GraphShuffleProbe {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(5)
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
    val shufWrite = new AtomicLong(0L)
    val jobs = new AtomicLong(0L)
    val stages = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        shufWrite.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        stages.incrementAndGet()
      }
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
      }
    })
    def graph() = {
      val n = 500000L
      val ids = spark.range(0, n).select(col("id").as("src"))
      ids.select(col("src"), ((col("src") * 37 + 11) % n).as("dst"))
        .union(ids.select(col("src"), ((col("src") * 53 + 7) % n).as("dst")))
        .union(ids.select(col("src"), (col("src") % 1024).as("dst")))
    }
    // mode "cc": chain-graph connected components with the driver
    // union-find gate forced OFF, so the distributed label-propagation
    // loop (the 100-TB path) is what gets measured. Chains of length
    // 32 converge in a few path-halving rounds; iters is unused.
    val ccMode = args.drop(1).headOption.contains("cc")
    def run(): Double = {
      Thread.sleep(2000)
      shufWrite.set(0L); jobs.set(0L); stages.set(0L)
      val t0 = System.nanoTime()
      if (ccMode) {
        val n = 500000L
        val pairs = spark.range(0, n).filter(col("id") % 32 =!= 0)
          .select((col("id") - 1).as("id_a"), col("id").as("id_b"))
        graft.ops.Dedup.connectedComponents(pairs, localMaxEdges = 0L)
          .groupBy(col("component")).agg(count(lit(1)).as("sz"))
          .orderBy(col("sz").desc).limit(20)
          .write.format("noop").mode("overwrite").save()
      } else {
        graft.ops.GraphRank.pageRank(graph(), iters = iters)
          .orderBy(col("rank").desc).limit(20)
          .write.format("noop").mode("overwrite").save()
      }
      val w = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000)
      w
    }
    run() // warm
    for (c <- 1 to 3) {
      val w = run()
      println(f"[graph] iters=$iters cycle $c: wall=$w%.3f " +
        f"shuffle_write=${shufWrite.get / 1e6}%.1fMB jobs=${jobs.get} " +
        f"stages=${stages.get}")
    }
    spark.stop()
  }
}
