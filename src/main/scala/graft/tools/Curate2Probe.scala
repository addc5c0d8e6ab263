package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the second curation batch (curate pipeline,
  * incremental minhash dedup, adaptive cut): times each on the
  * Amplify-derived corpora (same cached dirs as CurateProbe) so
  * SCALE.md records linearity.
  *
  * Usage: runMain graft.tools.Curate2Probe [sfDir] [factors]
  */
object Curate2Probe {
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
    for (f <- factors) {
      val base = spark.read.parquet(s"$sfDir/documents.parquet")
      val dir = new java.io.File(
        sys.props("java.io.tmpdir"), s"graft_curateprobe_x$f.parquet")
      if (!dir.exists())
        Amplify.documents(base, f)
          .repartition(spark.sparkContext.defaultParallelism)
          .write.mode("overwrite").parquet(dir.getAbsolutePath)
      val docs = spark.read.parquet(dir.getAbsolutePath)
      val n = docs.count()
      val tCurate = time(graft.ops.Curation
        .curate(docs, "doc_id", "text", "lang", minTokens = 40)
        .write.format("noop").mode("overwrite").save())
      val bkt = graft.ops.Sampling.hashBucket(col("text"))
      // persisted index, derived once per factor (production artifact)
      val idxDir = new java.io.File(
        sys.props("java.io.tmpdir"), s"graft_curate2_mhindexc_x$f.parquet")
      val tIndex =
        if (idxDir.exists()) 0.0
        else time(graft.ops.Dedup.minhashIndex(docs.filter(bkt < 9000),
            "doc_id", "text")
          .write.mode("overwrite").parquet(idxDir.getAbsolutePath))
      val index = spark.read.parquet(idxDir.getAbsolutePath)
      val tShard = time(graft.ops.Dedup.minhashNewVsPrebuiltIndex(
          docs.filter(bkt >= 9000), index, "doc_id", "text", threshold = 0.4)
        .write.format("noop").mode("overwrite").save())
      val tCut = time(graft.ops.Curation.adaptiveQuantileCut(docs,
          "doc_id", "n_chars", "lang", q = 0.1)
        .write.format("noop").mode("overwrite").save())
      println(f"PROBE curate2 x$f%d n=$n%d curate=$tCurate%.2f s " +
        f"index=$tIndex%.2f s shard=$tShard%.2f s cut=$tCut%.2f s")
    }
    spark.stop()
  }
}
