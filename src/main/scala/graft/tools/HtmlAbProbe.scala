package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interleaved same-JVM A/B of Html.htmlToText (r15 kernel) vs the
  * r14 regexp_replace expression chain (htmlToTextExpr), over the x19
  * payload template at an amplified doc count — isolates the
  * html-strip cost from the WARC read/gunzip/decode the bench row
  * also pays. Not part of the driver contract; SCALE.md records the
  * numbers.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.HtmlAbProbe [factor] [cycles]"
  */
object HtmlAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val f = args.lift(0).map(_.toInt).getOrElse(100)
    val cycles = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Amplify.documents(
      spark.read.parquet(s"$sfDir/documents.parquet").repartition(32), f)
      .select(concat(
        lit(graft.queries.BenchHeavy.X19PayloadPrefix), col("doc_id"),
        lit(graft.queries.BenchHeavy.X19PayloadMid), col("text"),
        lit(graft.queries.BenchHeavy.X19PayloadSuffix)).as("html"))
      .localCheckpoint() // both sides read identical materialized input
    def time(tag: String, c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      docs.select(size(split(c, " ")).as("nt"))
        .agg(sum(col("nt")), count(lit(1)))
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[htmlab] $tag%-8s $s%.3f s")
      s
    }
    // warm both
    time("warm-k", graft.ops.Html.htmlToText(col("html")))
    time("warm-e", graft.ops.Html.htmlToTextExpr(col("html")))
    (1 to cycles).foreach { i =>
      val k = time(s"kernel-$i", graft.ops.Html.htmlToText(col("html")))
      val e = time(s"expr-$i", graft.ops.Html.htmlToTextExpr(col("html")))
      println(f"[htmlab] cycle $i speedup=${e / k}%.2f")
    }
    spark.stop()
  }
}
