package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** IVF ANN another decade up: Amplify-derived rotation-disjoint
  * embedding corpora (×100 / ×1000 over sf0.1's 20k = 2M vectors at
  * the top; ×2500 = 5M for the r14 sf100-class row), nLists scaled
  * with sqrt(corpus) as a deployment would.
  *
  * r14 (verdict #7): the probe now records task-level shuffle
  * read/write and disk spill for the build+serve pass, and measures
  * RECALL@k at the documented nProbe contract against exact brute
  * force over the same query batch — the 5M-vector row needs all
  * three (wall, shuffle/spill, recall), not just wall time.
  *
  * Usage: runMain graft.tools.IvfScaleProbe [sfDir] [factors] [nQRecall]
  */
object IvfScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("100,1000").split(",").map(_.toInt)
    val nQRecall = args.lift(2).map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    val spill = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          spill.addAndGet(m.diskBytesSpilled)
        }
      }
    })
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (f <- factors) {
      val dir = new java.io.File(
        sys.props("java.io.tmpdir"), s"graft_emb_x$f.parquet")
      if (!dir.exists())
        Amplify.embeddings(
            spark.read.parquet(s"$sfDir/embeddings.parquet"), f)
          .repartition(spark.sparkContext.defaultParallelism)
          .write.mode("overwrite").parquet(dir.getAbsolutePath)
      val emb = spark.read.parquet(dir.getAbsolutePath)
      val n = emb.count()
      val nLists = math.max(64, math.sqrt(n.toDouble).toInt / 8 * 8)
      val nProbe = math.max(8, nLists / 16)
      val queries = emb.filter(col("vec_id") < 200)
      def ivf() = Similarity.ivfTopK(emb, queries, dim = 64, k = 10,
          nLists = nLists, nProbe = nProbe, iters = 1)
        .write.format("noop").mode("overwrite").save()
      ivf() // warm-up (includes centroid training both times; ivfTopK is one-shot)
      // listener events are delivered async — drain before resetting
      // and again before reading, or warm-up stragglers land in the
      // measured totals / the measured tail is missed (r14 review)
      Thread.sleep(3000)
      shufWrite.set(0); shufRead.set(0); spill.set(0)
      val t = time(ivf())
      Thread.sleep(3000)
      println(f"PROBE ivf x$f%d n=$n%d nLists=$nLists%d nProbe=$nProbe%d " +
        f"t=$t%.1f s shuffle_write=${shufWrite.get / 1e6}%.0f MB " +
        f"shuffle_read=${shufRead.get / 1e6}%.0f MB " +
        f"disk_spill=${spill.get / 1e6}%.0f MB")
      // Recall@10 at the nProbe contract, measured against exact brute
      // force over a smaller query slice (brute force is O(nQ × n)).
      val qr = emb.filter(col("vec_id") < nQRecall)
      val approx = Similarity.ivfTopK(emb, qr, dim = 64, k = 10,
          nLists = nLists, nProbe = nProbe, iters = 1)
        .select(col("query_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = Similarity.bruteForceTopK(emb, qr, 10)
        .select(col("query_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (approx & exact).size.toDouble / math.max(1, exact.size)
      println(f"PROBE ivf x$f%d recall@10(nProbe=$nProbe%d, nQ=$nQRecall%d) = $recall%.4f")
    }
    spark.stop()
  }
}
