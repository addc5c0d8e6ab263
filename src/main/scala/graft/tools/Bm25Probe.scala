package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BM25 serving-throughput probe across corpus sizes: times the
  * persisted-index serving path (x09's shape) on the Amplify-derived
  * corpora so HEAVY_BASELINE can record whether the toy-scale ratio
  * inverts with size like x05/x06/l43 did.
  *
  * Usage: runMain graft.tools.Bm25Probe [sfDir] [factors]
  */
object Bm25Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("10,100").split(",").map(_.toInt)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val queries = spark.range(16).select(col("id").as("query_id"),
      concat(lit("spark window agg stream "), (col("id") % 4).cast("string"),
        lit(" customer vector filter table join")).as("query_text"))
    for (f <- factors) {
      val base = spark.read.parquet(s"$sfDir/documents.parquet")
      val dir = new java.io.File(
        sys.props("java.io.tmpdir"), s"graft_curateprobe_x$f.parquet")
      if (!dir.exists())
        Amplify.documents(base, f)
          .repartition(spark.sparkContext.defaultParallelism)
          .write.mode("overwrite").parquet(dir.getAbsolutePath)
      val docs = spark.read.parquet(dir.getAbsolutePath)
      val idxDir = new java.io.File(
        sys.props("java.io.tmpdir"), s"graft_bm25probe_idx_x$f.parquet")
      val tIndex =
        if (idxDir.exists()) 0.0
        else time(graft.ops.Retrieval.bm25Index(docs, "doc_id", "text")
          .write.mode("overwrite").parquet(idxDir.getAbsolutePath))
      val postings = spark.read.parquet(idxDir.getAbsolutePath)
      val statsDir = new java.io.File(
        sys.props("java.io.tmpdir"), s"graft_bm25probe_stats_x$f.parquet")
      if (!statsDir.exists())
        graft.ops.Retrieval.bm25IndexStats(postings)
          .write.mode("overwrite").parquet(statsDir.getAbsolutePath)
      val stats = spark.read.parquet(statsDir.getAbsolutePath)
      // warm-up then best-of-3 (the bench convention)
      def serve(): Unit = graft.ops.Retrieval
        .bm25TopKFromIndex(postings, queries, k = 20,
          precomputedStats = Some(stats))
        .write.format("noop").mode("overwrite").save()
      serve()
      val tServe = (1 to 3).map(_ => time(serve())).min
      // the old serve shape for comparison: stats re-derived per batch
      def serveInline(): Unit = graft.ops.Retrieval
        .bm25TopKFromIndex(postings, queries, k = 20)
        .write.format("noop").mode("overwrite").save()
      serveInline()
      val tServeInline = (1 to 3).map(_ => time(serveInline())).min
      println(f"PROBE bm25 x$f%d serve_inline_stats=$tServeInline%.2f s")
      val tOneShot = time(graft.ops.Retrieval
        .bm25TopK(docs, "doc_id", "text", queries, k = 20)
        .write.format("noop").mode("overwrite").save())
      println(f"PROBE bm25 x$f%d n=${docs.count()}%d index=$tIndex%.2f s " +
        f"serve=$tServe%.2f s oneshot=$tOneShot%.2f s")
    }
    spark.stop()
  }
}
