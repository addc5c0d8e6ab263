package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade drive for the l79 end-to-end LSH dedup pipeline (CW-minhash
  * pairs → connected components → keep-best): 50k and 500k docs, wall
  * + output cardinalities — the full production dedup chain as one
  * number per decade.
  */
object L79Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("L79_PARTS", "64"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (f <- args.headOption.map(_.split(",").map(_.toInt)).getOrElse(Array(10, 100))) {
      val dir = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_bench_documents_x${f}_root_testdata_sf0_1.parquet")
      require(dir.exists(), s"amplified x$f dir missing")
      val docs = spark.read.parquet(dir.getAbsolutePath)
      val t0 = System.nanoTime()
      val pairs = graft.ops.Dedup.minhashPairsExact(docs, "doc_id", "text",
          shingleN = 5, numHashes = 64, bands = 16, threshold = 0.4)
        .select(col("id_a"), col("id_b"))
      val kept = graft.ops.Dedup.keepBest(docs,
        graft.ops.Dedup.connectedComponents(pairs), "doc_id", "n_chars")
      val n = kept.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[l79] x$f (${f * 5000} docs): $secs%.1f s, $n canonical rows")
    }
    spark.stop()
  }
}
