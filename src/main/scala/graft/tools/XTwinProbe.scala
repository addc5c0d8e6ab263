package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Production-vs-oracle-twin agreement probe (r13 verdict #3): the
  * bench rows x03/x06/x07/x08/x09/x13/x16 exercise PRODUCTION kernels
  * (FNV/CW hash families, persisted-index serving, size-gated scoring)
  * whose correctness until r14 rode ScalaTest agreement specs only.
  * This probe measures, on the real driver testdata, whether each
  * production path's OUTPUT equals the registered oracle twin's output
  * exactly — the precondition for registering the ProductionChecks
  * rows that put the production kernels under the driver's DuckDB gate
  * every round. Args: sfDir (default sf0.01).
  */
object XTwinProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.ops._
    val docs = graft.Tables.documents(spark, d)
    val emb = graft.Tables.embeddings(spark, d)

    def diff(name: String, a: DataFrame, b: DataFrame): Unit = {
      val (na, nb) = (a.count(), b.count())
      val d1 = a.exceptAll(b).count()
      val d2 = b.exceptAll(a).count()
      println(s"[xtwin] $name: prod=$na twin=$nb prod-twin=$d1 twin-prod=$d2 " +
        (if (d1 == 0 && d2 == 0 && na == nb) "OK" else "MISMATCH"))
    }

    // x03: production CW/FNV minhashPairs vs the md5-exact l03 twin
    diff("x03_minhash",
      Dedup.minhashPairs(docs, "doc_id", "text", 5, 64, 16, 0.4)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("j")),
      Dedup.minhashPairsExact(docs, "doc_id", "text", 5, 64, 16, 0.4)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("j")))

    // x08: production persisted-index new-vs-index vs the md5 l40 twin
    val bkt = Sampling.hashBucket(col("text"))
    val idx = Dedup.minhashIndex(docs.filter(bkt < 5000), "doc_id", "text")
    diff("x08_incremental",
      Dedup.minhashNewVsPrebuiltIndex(docs.filter(bkt >= 5000), idx,
          "doc_id", "text", threshold = 0.4)
        .select(col("new_id"), col("n_matches"),
          round(col("best_jaccard"), 6).as("bj"), col("best_match_id")),
      Dedup.minhashNewVsIndexExact(docs.filter(bkt >= 5000),
          docs.filter(bkt < 5000), "doc_id", "text", 5, 64, 16, 0.4)
        .select(col("new_id"), col("n_matches"),
          round(col("best_jaccard"), 6).as("bj"), col("best_match_id")))

    // x06: FNV dupChunkFraction vs md5 (l36 config)
    diff("x06_dup_spans",
      CorpusStats.dupChunkFraction(docs, "doc_id", "text", 5, 2, exactHash = false),
      CorpusStats.dupChunkFraction(docs, "doc_id", "text", 5, 2, exactHash = true))

    // x13: FNV exactSubstrSpans vs md5 (l68 config)
    diff("x13_exact_substr",
      CorpusStats.exactSubstrSpans(docs, "doc_id", "text", 8, 2, exactHash = false),
      CorpusStats.exactSubstrSpans(docs, "doc_id", "text", 8, 2, exactHash = true))

    // x07: size-gated scoreAuto (broadcast path at this scale) vs the
    // l38 join-path twin — both rounded like the driver's 6dp compare
    val model = LmScore.trainStupidBackoff(
      Sampling.hashSample(docs, "text", 0.5), "text")
    val autoCols = LmScore.scoreAuto(docs, model, "doc_id", "text").columns
    println(s"[xtwin] lm cols: ${autoCols.mkString(",")}")
    def r6(df: DataFrame): DataFrame =
      df.select(df.columns.map { c =>
        if (df.schema(c).dataType == org.apache.spark.sql.types.DoubleType)
          round(col(c), 6).as(c) else col(c)
      }: _*)
    diff("x07_lm_score",
      r6(LmScore.scoreAuto(docs, model, "doc_id", "text")),
      r6(LmScore.scoreStupidBackoff(docs,
        Sampling.hashSample(docs, "text", 0.5), "doc_id", "text")))

    // x09: persisted-postings bm25TopKFromIndex vs direct bm25TopK
    import spark.implicits._
    val q = Seq((0L, "spark window agg"), (1L, "vector stream join"),
      (2L, "customer query filter table")).toDF("query_id", "query_text")
    val postings = Retrieval.bm25Index(docs, "doc_id", "text")
    val stats = Retrieval.bm25IndexStats(postings)
    diff("x09_bm25",
      r6(Retrieval.bm25TopKFromIndex(postings, q, 10,
        precomputedStats = Some(stats))),
      r6(Retrieval.bm25TopK(docs, "doc_id", "text", q, 10)))

    // x16: partitioned-index serving at FULL probe vs brute force
    val cents = Similarity.ivfCentroids(emb, dim = 64, nLists = 8, iters = 2)
    val tmp = java.nio.file.Files.createTempDirectory("xtwin_ivf").toFile
    Similarity.ivfAssignWithModel(emb, cents)
      .write.mode("overwrite").partitionBy("list_id")
      .parquet(tmp.getAbsolutePath)
    diff("x16_ivf_serve",
      Similarity.ivfTopKFromPartitionedIndex(spark, tmp.getAbsolutePath,
          cents, emb.filter(col("vec_id") < 10), k = 5, nProbe = 8)
        .select(col("query_id"), col("vec_id"),
          round(col("cos"), 6).as("cos"), col("rank")),
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), 5)
        .select(col("query_id"), col("vec_id"),
          round(col("cos"), 6).as("cos"), col("rank")))

    spark.stop()
  }
}
