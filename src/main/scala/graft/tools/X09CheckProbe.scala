package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-timing probe for the x09_bm25_check row (r14: 14–18 s at
  * sf0.01 where l54's direct bm25TopK is sub-second — find the stage).
  */
object X09CheckProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.ops._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[x09probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.Tables.documents(spark, d)
    val q = Seq((0L, "spark window agg"), (1L, "vector stream join"),
      (2L, "customer query filter table")).toDF("query_id", "query_text")
    val tmp = java.nio.file.Files.createTempDirectory("x09probe").toFile
    t("index build+write") {
      Retrieval.bm25Index(docs, "doc_id", "text")
        .write.mode("overwrite").parquet(tmp.getAbsolutePath)
    }
    val postings = spark.read.parquet(tmp.getAbsolutePath)
    val stats = t("stats") {
      val s0 = Retrieval.bm25IndexStats(postings)
      s0.collect(); s0
    }
    t("serve1") {
      Retrieval.bm25TopKFromIndex(postings, q, 10,
        precomputedStats = Some(stats)).collect()
    }
    t("serve2") {
      Retrieval.bm25TopKFromIndex(postings, q, 10,
        precomputedStats = Some(stats)).collect()
    }
    t("direct_l54") {
      Retrieval.bm25TopK(docs, "doc_id", "text", q, 10).collect()
    }
    spark.stop()
  }
}
