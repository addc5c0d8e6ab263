package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf100-class stress of the flagship LSH dedup chain (r12 verdict #6):
  * the full l79 pipeline (CW-minhash banding → candidate pairs →
  * connected components → keep-best) on an amplified ~5M-doc corpus
  * (×1000 over sf0.1), with SHUFFLE BYTES recorded alongside wall time
  * so the 100-TB posture ("band buckets move keys+ids, never
  * documents") is a measured number, not only a plan-shape argument.
  *
  * Usage: runMain graft.tools.L79StressProbe [factor] (default 1000).
  * The amplified dir is cached in tmpdir under a _done marker; the
  * derivation cost is printed separately and excluded from the
  * pipeline wall time.
  */
object L79StressProbe {
  def main(args: Array[String]): Unit = {
    val f = args.headOption.map(_.toInt).getOrElse(1000)
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      // 5M docs → 80M banded keys; 128 partitions keeps each candidate
      // shuffle partition well inside executor memory (the same 4×-cores
      // sizing a 1000-executor job would use for a 100 TB corpus).
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("L79_PARTS", "128"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // amplified corpus, cached across runs
    val tag = new java.io.File(src).getAbsolutePath.replaceAll("[^A-Za-z0-9]", "_")
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_stress_documents_x$f$tag.parquet")
    this.synchronized {
      if (!new java.io.File(dir, "_SUCCESS").exists()) {
        val t0 = System.nanoTime()
        Amplify.documents(
            spark.read.parquet(s"$src/documents.parquet").repartition(32), f)
          .write.mode("overwrite").parquet(dir.getAbsolutePath)
        println(f"[l79stress] derived x$f corpus in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
    }

    // task-level shuffle accounting (read + write + spill), the number
    // the plan-shape audit predicts: bytes proportional to (band, key,
    // id) triples plus verified-pair joins, NEVER corpus × corpus.
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

    val docs = spark.read.parquet(dir.getAbsolutePath)
    val nDocs = docs.count()
    val inputBytes = dir.listFiles().map(_.length()).sum
    val t0 = System.nanoTime()
    val pairs = graft.ops.Dedup.minhashPairsExact(docs, "doc_id", "text",
        shingleN = 5, numHashes = 64, bands = 16, threshold = 0.4)
      .select(col("id_a"), col("id_b"))
    val kept = graft.ops.Dedup.keepBest(docs,
      graft.ops.Dedup.connectedComponents(pairs), "doc_id", "n_chars")
    val n = kept.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[l79stress] x$f ($nDocs docs, ${inputBytes / 1e6}%.0f MB parquet): " +
      f"$secs%.1f s, $n canonical rows, " +
      f"shuffle_write=${shufWrite.get / 1e6}%.0f MB, " +
      f"shuffle_read=${shufRead.get / 1e6}%.0f MB, " +
      f"disk_spill=${spill.get / 1e6}%.0f MB, " +
      f"throughput=${nDocs / secs}%.0f docs/s")
    spark.stop()
  }
}
