package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicLong

/** 5M-doc stress for the r15 doc_id-bucketed BM25 layout (the r13
  * L79 protocol applied to the NEW at-rest shape): amplify the sf0.1
  * corpus ×f, ensure the term-partitioned + doc-bucketed catalog
  * table (+ df/stats sidecars), and serve a common-vocabulary batch —
  * the worst case for the serving aggregate, whose per-task hash
  * state is FIXED by the table's docBuckets (the scan's partitioning
  * carries the aggregate, so AQE cannot re-split it; a cluster sizes
  * docBuckets by index bytes at build time — this probe measures what
  * one bucket's share looks like at 5M docs on local[32]).
  * Deterministic outputs: shuffle/spill bytes, canon equality vs the
  * flat-index serving path over the same table. SCALE.md records the
  * numbers.
  *
  * Args: [f] [docBuckets] [termBuckets] — defaults 1000, 32, 256.
  */
object Bm25BucketedScaleProbe {
  def main(args: Array[String]): Unit = {
    val f = args.headOption.map(_.toInt).getOrElse(1000)
    val docBuckets = args.lift(1).map(_.toInt).getOrElse(32)
    val termBuckets = args.lift(2).map(_.toInt).getOrElse(256)
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shufWrite = new AtomicLong(0L)
    val spill = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        shufWrite.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        spill.addAndGet(sc.stageInfo.taskMetrics.diskBytesSpilled)
        val sp = sc.stageInfo.taskMetrics.diskBytesSpilled
        if (sp > 100_000_000L)
          println(f"[bm25bkscale]   stage ${sc.stageInfo.stageId}%d " +
            f"spill=${sp / 1e6}%.0f MB tasks=${sc.stageInfo.numTasks}%d " +
            s"name=${sc.stageInfo.name.takeWhile(_ != '\n').take(90)}")
      }
    })
    def phase[T](name: String)(body: => T): T = {
      Thread.sleep(2000)
      shufWrite.set(0L); spill.set(0L)
      val t0 = System.nanoTime()
      val r = body
      val w = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000)
      println(f"[bm25bkscale] $name: wall=$w%.1f s " +
        f"shuffle_write=${shufWrite.get / 1e6}%.0f MB " +
        f"spill=${spill.get / 1e6}%.0f MB")
      r
    }
    val corpusDir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_curateprobe_x$f.parquet")
    if (!new java.io.File(corpusDir, "_SUCCESS").exists())
      phase(s"amplify corpus x$f") {
        Amplify.documents(
            spark.read.parquet(s"$src/documents.parquet").repartition(32), f)
          .write.mode("overwrite").parquet(corpusDir.getAbsolutePath)
      }
    val docs = spark.read.parquet(corpusDir.getAbsolutePath)
      .select(col("doc_id"), col("text"))
    val t = s"bm25pbk_stress_x${f}_d${docBuckets}_t$termBuckets"
    phase(s"ensure bucketed index ($docBuckets doc buckets, $termBuckets term buckets)") {
      graft.ops.Retrieval.ensureBm25BucketedIndex(spark, t,
        graft.ops.Retrieval.bm25Index(docs, "doc_id", "text"),
        docBuckets = docBuckets, termBuckets = termBuckets)
    }
    val full = spark.table(t)
    val nPost = phase("postings count")(full.count())
    println(s"[bm25bkscale] postings=$nPost")
    // common-vocabulary batch (the bench shape): every doc matches, so
    // the serving aggregate holds ~queries × docs / docBuckets entries
    // per task — the stress point
    // the y09 bench batch verbatim (its vocabulary is known-common in
    // this corpus — the r14 record measured every doc matching)
    val queries = spark.range(16).select(col("id").as("query_id"),
      concat(lit("spark window agg stream "),
        (col("id") % 4).cast("string"),
        lit(" customer vector filter table join")).as("query_text"))
    def canon(dfr: DataFrame): (Long, Long) = {
      val r = dfr.agg(count(lit(1)), sum(col("doc_id"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val bucketed = phase("serve common batch BUCKETED (pruned, zero-exchange agg)") {
      canon(graft.ops.Retrieval.bm25TopKFromBucketedIndex(spark, t, queries, 20))
    }
    val stats = spark.table(t + "_stats").select(col("n_docs"), col("avgdl"))
    val flat = phase("serve common batch FLAT path over the same table") {
      canon(graft.ops.Retrieval.bm25TopKFromIndex(
        full.drop("term_bucket"), queries, 20, precomputedStats = Some(stats)))
    }
    println(s"[bm25bkscale] bucketed=$bucketed flat=$flat match=${bucketed == flat}")
    spark.stop()
  }
}
