package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicLong

/** Retrieval-family stress at the 5M-doc tier (the L79 protocol
  * extended to BM25, r13-verdict-#7 style): build the postings index
  * over the SAME 5M-doc planted stress corpus the dedup chain uses,
  * persist it term-bucket-partitioned, and serve batches from both
  * layouts with task-level shuffle accounting. The load-bearing
  * numbers are bytes/rows/file counts (deterministic); wall is
  * recorded but subordinate on this bimodal-band VM.
  *
  * Args: [f] [nBuckets] — defaults 1000 (×1000 over sf0.1 = 5M docs)
  * and 256. Requires the L79StressProbe corpus for the same f to
  * exist (run it first; the corpus is content-addressed in tmpdir).
  */
object Bm25ScaleProbe {
  def main(args: Array[String]): Unit = {
    val f = args.headOption.map(_.toInt).getOrElse(1000)
    val nBuckets = args.lift(1).map(_.toInt).getOrElse(256)
    // Build-side memory levers, exposed as args because BOTH classic
    // knobs were tested and neither is the binding one here: spill
    // stayed 7.4-8.9 GB across shuffle partitions 64/192 and input
    // splits 128/32 MB. Per-stage attribution (the >100MB stage lines
    // below) splits it ~3.6 GB map-side partial agg + ~1.7 GB reduce
    // agg + ~3.4 GB write-side sort — i.e. total in-flight aggregate/
    // sort state (~263M groups + the 256-way clustered write) against
    // local[32]'s per-task share of one 32 GB heap. On a real cluster
    // the same 128 MB split carries ~400 MB of partial-agg state
    // against a 2-8x larger per-task share (fewer cores per
    // executor), and the spill that remains is the graceful-
    // degradation path, not a failure: all three builds completed
    // with identical output (263,054,857 postings, canon-equal
    // serves) in 258-433 s wall.
    val shufParts = args.lift(2).map(_.toInt).getOrElse(64)
    val splitMb = args.lift(3).map(_.toInt).getOrElse(128)
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tag = new java.io.File(src).getAbsolutePath.replaceAll("[^A-Za-z0-9]", "_")
    val corpusDir = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_stress_planted_v2_x$f$tag.parquet")
    require(new java.io.File(corpusDir, "_SUCCESS").exists(),
      s"stress corpus missing at $corpusDir — run L79StressProbe $f first")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", shufParts.toString)
      .config("spark.sql.files.maxPartitionBytes", s"${splitMb}m")
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
          println(f"[bm25scale]   stage ${sc.stageInfo.stageId}%d " +
            f"spill=${sp / 1e6}%.0f MB tasks=${sc.stageInfo.numTasks}%d " +
            s"name=${sc.stageInfo.name.takeWhile(_ != '\n').take(90)}")
      }
    })
    def phase[T](name: String)(body: => T): T = {
      Thread.sleep(3000)
      shufWrite.set(0L); spill.set(0L)
      val t0 = System.nanoTime()
      val r = body
      val w = (System.nanoTime() - t0) / 1e9
      Thread.sleep(3000)
      println(f"[bm25scale] $name: wall=$w%.1f s " +
        f"shuffle_write=${shufWrite.get / 1e6}%.0f MB " +
        f"spill=${spill.get / 1e6}%.0f MB")
      r
    }
    val docs = spark.read.parquet(corpusDir.getAbsolutePath)
      .select(col("doc_id"), col("text"))

    val idxRoot = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_stress_bm25pidx_x${f}_p${shufParts}_s$splitMb$tag.parquet")
    if (!new java.io.File(idxRoot, "_stats/_SUCCESS").exists())
      phase(s"build+write partitioned index (${nBuckets} buckets)") {
        graft.ops.Retrieval.bm25WritePartitionedIndex(
          graft.ops.Retrieval.bm25Index(docs, "doc_id", "text"),
          idxRoot.getAbsolutePath, nBuckets)
      }
    val full = spark.read.parquet(idxRoot.getAbsolutePath)
    val nPost = phase("postings count")(full.count())
    val nFiles = idxRoot.listFiles().filter(_.getName.startsWith("term_bucket="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum
    println(s"[bm25scale] postings=$nPost files=$nFiles " +
      s"bytes=${fileSize(idxRoot)}")

    // query batches drawn from the INDEX itself (the stress corpus's
    // vocabulary is salted, so literal English terms would miss):
    // common = highest-df terms, rare = df==1 singletons.
    val byDf = full.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val common = byDf.orderBy(col("df").desc, col("term")).limit(8)
      .collect().map(_.getString(0))
    val rare = byDf.filter(col("df") === 1).orderBy(col("term")).limit(8)
      .collect().map(_.getString(0))
    println(s"[bm25scale] common df terms=${common.take(3).mkString(",")}… " +
      s"rare=${rare.take(3).mkString(",")}…")
    import spark.implicits._
    def qdf(terms: Array[String]) = terms.grouped(2).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("query_id", "query_text")
    val stats = spark.read.parquet(s"$idxRoot/_stats")
      .select(col("n_docs"), col("avgdl"))
    def canon(dfr: DataFrame): (Long, Long) = {
      val r = dfr.agg(count(lit(1)), sum(col("doc_id"))).head()
      (r.getLong(0), r.getLong(1))
    }
    for ((label, terms) <- Seq(("common", common), ("rare", rare))) {
      val q = qdf(terms)
      val flat = phase(s"serve $label FLAT (whole-index read)") {
        canon(graft.ops.Retrieval.bm25TopKFromIndex(
          full.drop("term_bucket"), q, 20, precomputedStats = Some(stats)))
      }
      val pruned = phase(s"serve $label PRUNED (bucket-filtered read)") {
        canon(graft.ops.Retrieval.bm25TopKFromPartitionedIndex(
          spark, idxRoot.getAbsolutePath, q, 20))
      }
      println(s"[bm25scale] $label flat=$flat pruned=$pruned " +
        s"match=${flat == pruned}")
    }
    spark.stop()
  }

  private def fileSize(d: java.io.File): Long =
    if (d.isDirectory) d.listFiles().map(fileSize).sum else d.length()
}
