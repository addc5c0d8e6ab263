package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicLong

/** y09 (flat postings serving) vs y10 (term-bucket-partitioned
  * serving) with BAND-IMMUNE evidence: wall on this VM is bimodal
  * across and even WITHIN a JVM, so the load-bearing numbers here are
  * per-run INPUT BYTES and task counts (deterministic in layout +
  * plan), with wall sampled over interleaved cycles so band drift
  * hits both queries symmetrically. The input-bytes delta is the
  * pruning claim itself: a flat read pays the whole index per serving
  * batch; the partitioned read pays the probed buckets only.
  */
object Y10Probe {
  def main(args: Array[String]): Unit = {
    val cycles = args.headOption.map(_.toInt).getOrElse(4)
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
    graft.plans.FramelessWindowStrategy.install(spark)
    val inBytes = new AtomicLong(0L)
    val shufWrite = new AtomicLong(0L)
    val tasks = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        inBytes.addAndGet(sc.stageInfo.taskMetrics.inputMetrics.bytesRead)
        shufWrite.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        tasks.addAndGet(sc.stageInfo.numTasks.toLong)
      }
    })
    val all = graft.SparkEntry.benchHeavyQueries
    def run(name: String): (Double, Long, Long, Long) = {
      val q = all.find(_.name == name).getOrElse(sys.error(s"unknown: $name"))
      // listener events are delivered async (the IvfScaleProbe
      // drain pattern): settle before resetting and before reading
      Thread.sleep(2000)
      inBytes.set(0L); shufWrite.set(0L); tasks.set(0L)
      val t0 = System.nanoTime()
      q.impl(spark, sfDir).write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000)
      (w, inBytes.get(), shufWrite.get(), tasks.get())
    }
    // warm both once (cold-build artifacts, JIT, page cache)
    run("y09_bm25_topk_500k"); run("y10_bm25_partitioned_500k")
    var w09 = List.empty[Double]; var w10 = List.empty[Double]
    for (c <- 1 to cycles) {
      val a = run("y09_bm25_topk_500k")
      val b = run("y10_bm25_partitioned_500k")
      w09 ::= a._1; w10 ::= b._1
      println(f"[y10] cycle $c: y09 wall=${a._1}%.3f in=${a._2 / 1e6}%.1fMB " +
        f"shuf=${a._3 / 1e6}%.1fMB tasks=${a._4} | " +
        f"y10 wall=${b._1}%.3f in=${b._2 / 1e6}%.1fMB " +
        f"shuf=${b._3 / 1e6}%.1fMB tasks=${b._4}")
    }
    println(f"[y10] min wall: y09=${w09.min}%.3f y10=${w10.min}%.3f")

    // ===== rare-vocabulary pair: the scan-bound regime =====
    // The 16-query bench batch uses corpus-common terms, so serving is
    // aggregation-bound and pruning's input saving is a minor share.
    // A rare/audit vocabulary (here: terms absent from the corpus) is
    // the other deployment regime — nothing matches, so the whole
    // serve IS the index read + floor, and the flat-vs-pruned wall
    // delta is exactly the per-batch scan the layout deletes.
    import org.apache.spark.sql.functions.{col, lit, concat}
    val f = 100 // the 500k amplification factor the bench rows use
    val tag = new java.io.File(sfDir).getAbsolutePath
      .replaceAll("[^A-Za-z0-9]", "_")
    val flatIdx = spark.read.parquet(new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_bench_bm25idx_x$f$tag.parquet")
      .getAbsolutePath)
    val statsP = spark.read.parquet(new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_bench_bm25stats_x$f$tag.parquet")
      .getAbsolutePath)
    val pRoot = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_bench_bm25pidx_x$f$tag.parquet")
      .getAbsolutePath
    val rareQ = spark.range(4).select(col("id").as("query_id"),
      concat(lit("zymurgy"), col("id").cast("string"),
        lit(" quokkagraph xylotomy")).as("query_text"))
    def runDf(label: String, mk: () => org.apache.spark.sql.DataFrame):
        (Double, Long, Long, Long) = {
      Thread.sleep(2000)
      inBytes.set(0L); shufWrite.set(0L); tasks.set(0L)
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000)
      (w, inBytes.get(), shufWrite.get(), tasks.get())
    }
    def flatRare() = graft.ops.Retrieval.bm25TopKFromIndex(
      flatIdx, rareQ, 20, precomputedStats = Some(statsP))
    def prunedRare() = graft.ops.Retrieval.bm25TopKFromPartitionedIndex(
      spark, pRoot, rareQ, 20)
    runDf("warm", flatRare _); runDf("warm", prunedRare _)
    var r09 = List.empty[Double]; var r10 = List.empty[Double]
    for (c <- 1 to cycles) {
      val a = runDf("flat", flatRare _)
      val b = runDf("pruned", prunedRare _)
      r09 ::= a._1; r10 ::= b._1
      println(f"[y10-rare] cycle $c: flat wall=${a._1}%.3f " +
        f"in=${a._2 / 1e6}%.1fMB tasks=${a._4} | pruned wall=${b._1}%.3f " +
        f"in=${b._2 / 1e6}%.1fMB tasks=${b._4}")
    }
    println(f"[y10-rare] min wall: flat=${r09.min}%.3f pruned=${r10.min}%.3f")
    spark.stop()
  }
}
