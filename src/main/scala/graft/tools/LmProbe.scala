package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale probe for LM scoring (l38/x07): times
  * LmScore.scoreStupidBackoff on Amplify-derived corpora at several
  * factors (same cached dirs as CurateProbe), so SCALE.md can record
  * whether wall-time stays linear in corpus size — the plan is joins
  * and aggregates only, so anything super-linear means a join shape
  * regressed.
  *
  * Usage: runMain graft.tools.LmProbe [sfDir] [factors]
  */
object LmProbe {
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
      val ref = graft.ops.Sampling.hashSample(docs, "text", 0.5)
      val tOneShot = time(graft.ops.LmScore.scoreStupidBackoff(docs,
          ref, "doc_id", "text")
        .write.format("noop").mode("overwrite").save())
      var tTrain = 0.0
      var model: graft.ops.LmScore.BigramModel = null
      tTrain = time {
        model = graft.ops.LmScore.trainStupidBackoff(ref, "text").cache()
      }
      val tScore = time(graft.ops.LmScore
        .scoreWithModel(docs, model, "doc_id", "text")
        .write.format("noop").mode("overwrite").save())
      val tKernel = time(graft.ops.LmScore
        .scoreWithBroadcastModel(docs, model, "doc_id", "text")
        .write.format("noop").mode("overwrite").save())
      model.unpersist()
      println(f"PROBE lm_score x$f%d n=$n%d oneshot=$tOneShot%.2f s " +
        f"train=$tTrain%.2f s score=$tScore%.2f s kernel=$tKernel%.2f s")
    }
    spark.stop()
  }
}
