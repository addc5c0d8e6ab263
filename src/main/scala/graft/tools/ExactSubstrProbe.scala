package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for exact-substring dedup (CorpusStats.exactSubstrSpans)
  * at the Amplify decades: wall time AND measured total shuffle-write
  * bytes, so SCALE.md records the O(corpus)-shuffle claim as a number
  * (bytes/token should stay ~flat across decades; an all-pairs or
  * text-carrying formulation would grow it).
  *
  * Usage: runMain graft.tools.ExactSubstrProbe [sfDir] [factors] [minTokens]
  */
object ExactSubstrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("10,100").split(",").map(_.toInt)
    val minTokens = args.lift(2).getOrElse("50").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null)
          shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })
    for (f <- factors) {
      // shared amplified-corpus cache with CorpusOpsProbe
      val base = spark.read.parquet(s"$sfDir/documents.parquet")
      val dir = new java.io.File(
        sys.props("java.io.tmpdir"), s"graft_curateprobe_x$f.parquet")
      if (!dir.exists())
        Amplify.documents(base, f)
          .repartition(spark.sparkContext.defaultParallelism)
          .write.mode("overwrite").parquet(dir.getAbsolutePath)
      val docs = spark.read.parquet(dir.getAbsolutePath)
      val stats = docs.select(count(lit(1)).as("n"),
        sum(size(split(lower(col("text")),
          graft.kernel.TextKernel.WsPlus))).as("toks")).head()
      val (nDocs, nToks) = (stats.getLong(0), stats.getLong(1))
      Thread.sleep(2000); shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      graft.ops.CorpusStats.exactSubstrSpans(docs, "doc_id", "text",
          minTokens, minCount = 2, exactHash = false)
        .write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // listener bus drain
      val gb = shuffleBytes.get / 1e9
      println(f"[probe] x$f%-4d docs=$nDocs%8d toks=$nToks%10d " +
        f"exact_substr ${secs}%8.2f s shuffle=${gb}%7.3f GB " +
        f"(${shuffleBytes.get.toDouble / nToks}%5.2f B/token)")
    }
    spark.stop()
  }
}
