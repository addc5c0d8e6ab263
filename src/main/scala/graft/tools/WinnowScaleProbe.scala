package graft.tools
import org.apache.spark.sql.SparkSession

/** Decade drive for the l81/x17 winnowing-pairs family: 50k → 500k
  * docs (the x17 corpus ×10), recording wall time and output
  * cardinality. The claim under test: cost is md5-bound and LINEAR in
  * corpus bytes (one digest per k-gram), the fingerprint exchange is
  * keys-only, and the df-prune keeps the pair join bounded no matter
  * the corpus size.
  */
object WinnowScaleProbe {
  def main(args: Array[String]): Unit = {
    // Session shuffle partitions stay at the bench default 32: the op
    // auto-sizes its own fingerprint exchange from input stats (r11 —
    // the 425M-row exchange at 5M docs OOM'd at 32 partitions and
    // needed a manual WINNOW_PARTS=256 before; the probe's job now is
    // to prove NO knob is needed). Env override kept for A/B only.
    val parts = sys.env.getOrElse("WINNOW_PARTS", "32")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = "/root/testdata/sf0.1"
    for (f <- args.headOption.map(_.split(",").map(_.toInt))
           .getOrElse(Array(10, 100))) {
      val dir = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_bench_documents_x${f}_root_testdata_sf0_1.parquet")
      if (!dir.exists())
        graft.tools.Amplify.documents(
            spark.read.parquet(s"$sfDir/documents.parquet"), f)
          .repartition(parts.toInt)
          .write.mode("overwrite").parquet(dir.getAbsolutePath)
      val docs = spark.read.parquet(dir.getAbsolutePath)
      val q = graft.ops.Dedup.winnowSimilarityPairs(docs, "doc_id", "text",
        k = 8, w = 4, minShared = 2, maxDf = 8)
      // warm once, time second
      q.write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      val n = q.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[winnow] x$f (${f * 5000} docs): $secs%.1f s, $n pairs")
    }
    spark.stop()
  }
}
