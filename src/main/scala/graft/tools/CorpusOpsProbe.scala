package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-8 corpus ops — token drift, DSIR
  * importance weighting, preference pairs, BPE training — on the
  * Amplify-derived corpora (x10 = 50k docs, x100 = 500k docs), so
  * SCALE.md can record measured wall-times instead of asserted shapes.
  *
  * Usage: runMain graft.tools.CorpusOpsProbe [sfDir] [factors] [bpeMerges]
  */
object CorpusOpsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("10,100").split(",").map(_.toInt)
    val bpeMerges = args.lift(2).getOrElse("20").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
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
      val nDocs = docs.count()

      // token drift: prev = drop 10%, mutate every 7th, add a slice
      val prev = docs.filter(col("doc_id") % 10 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
      val (driftRow, tDrift) = time(
        graft.ops.CorpusStats.tokenDrift(prev, docs, "doc_id", "text")
          .collect()(0))
      println(f"[probe] x$f%-4d docs=$nDocs%8d token_drift  ${tDrift}%8.2f s " +
        s"(vocab_both=${driftRow.getAs[Long]("vocab_both")}, " +
        f"tvd=${driftRow.getAs[Double]("tvd")}%.4f)")

      // DSIR: target = every 9th doc; weights then full-corpus scoring
      val dim = 1 << 18
      val (wCnt, tW) = time {
        val w = graft.ops.Dsir.importanceWeights(
          docs.filter(col("doc_id") % 9 === 0), docs, "doc_id", "text", dim)
        w.cache().count()
      }
      val wTab = graft.ops.Dsir.importanceWeights(
        docs.filter(col("doc_id") % 9 === 0), docs, "doc_id", "text", dim)
      val (selCnt, tScore) = time(
        graft.ops.Dsir.importanceScore(docs, "doc_id", "text",
          wTab, dim).filter(col("selected")).count())
      println(f"[probe] x$f%-4d docs=$nDocs%8d dsir_weights ${tW}%8.2f s " +
        f"(features=$wCnt) dsir_score ${tScore}%8.2f s (selected=$selCnt)")

      // preference pairs over classifier-scored completions
      val (pairCnt, tPref) = time(
        graft.ops.Preference.preferencePairs(
          graft.ops.QualityClassifier.scoreLinear(docs, "doc_id", "text",
              graft.ops.QualityClassifier.formulaWeights(spark, 4096), 4096)
            .withColumn("prompt_id", col("doc_id") % 40000),
          "prompt_id", "doc_id", "z_milli").count())
      println(f"[probe] x$f%-4d docs=$nDocs%8d pref_pairs   ${tPref}%8.2f s " +
        s"(pairs=$pairCnt)")

      // BPE: word-count pass over the corpus once, then vocab-sized
      // merge iterations
      val vocabN = graft.ops.BpeTrainer.wordCounts(docs, "text").count()
      val (merges, tBpe) = time(
        graft.ops.BpeTrainer.trainMerges(docs, "text", bpeMerges))
      println(f"[probe] x$f%-4d docs=$nDocs%8d bpe_train    ${tBpe}%8.2f s " +
        s"(vocab=$vocabN, merges=${merges.take(5).mkString(",")}...)")
    }
    spark.stop()
  }
}
