package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-7 curation ops (line dedup, duplicated
  * spans, bloom decontamination): times each on an amplified corpus
  * derived in-memory from a documents.parquet dir, at several corpus
  * sizes, so SCALE.md can record whether wall-time grows linearly
  * with the corpus (the designed shape — every one of these is a
  * wordcount-skeleton plan) or something super-linear crept in.
  *
  * Usage: runMain graft.tools.CurateProbe [sfDir] [factors]
  *   e.g.  runMain graft.tools.CurateProbe /root/testdata/sf0.1 10,100
  */
object CurateProbe {
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

      val multi = docs.select(col("doc_id"),
        concat(
          lit("header "), col("doc_id") % 7,
          lit("\nuniq "), md5(col("doc_id").cast("string")),
          lit("\n\nmid "), col("doc_id") % 250,
          lit("\nfooter "), col("doc_id") % 3).as("text"))
      val tLine = time(graft.ops.CorpusStats
        .dedupLines(multi, "doc_id", "text", minDocs = 3)
        .write.format("noop").mode("overwrite").save())

      val tSpan = time(graft.ops.CorpusStats
        .dupChunkFraction(docs, "doc_id", "text", chunkTokens = 5, minDocs = 2)
        .write.format("noop").mode("overwrite").save())
      val tSpanFast = time(graft.ops.CorpusStats
        .dupChunkFraction(docs, "doc_id", "text", chunkTokens = 5, minDocs = 2,
          exactHash = false)
        .write.format("noop").mode("overwrite").save())

      // benchmark side stays fixed-size (eval suites don't grow with
      // the corpus); bloom prunes the amplified corpus map-side
      val bench = base.filter(col("doc_id") % 17 === 0)
      val tBloom = time(graft.ops.Decontaminate
        .decontaminateBloom(docs, bench, "doc_id", "text", n = 6, fpp = 0.01)
        .write.format("noop").mode("overwrite").save())

      println(f"[curateprobe] x$f%-4d docs=$n%-8d line_dedup=$tLine%.2fs dup_spans=$tSpan%.2fs dup_spans_fast=$tSpanFast%.2fs bloom_decontaminate=$tBloom%.2fs")
    }
    spark.stop()
  }
}
