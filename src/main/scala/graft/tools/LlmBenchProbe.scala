package graft.tools

import org.apache.spark.sql.SparkSession

/** Times a subset of the LLM-pipeline queries whose oracle SQL is a
  * natural DuckDB formulation (so a cross-engine comparison is
  * meaningful, unlike the md5-contorted exactness oracles). Prints one
  * JSON line; pair with the DuckDB timings in SCALE.md. */
object LlmBenchProbe {
  val Names = Seq(
    "l01_exact_dedup", "l02_ngram_jaccard", "l05_ann_topk",
    "l12_dedup_clusters", "l13_hash_sample", "l18_repetition_signals",
    "l19_pii_redaction", "l20_semantic_dedup")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val defs = graft.SparkEntry.allQueryDefs.filter(d => Names.contains(d.name))
    defs.foreach { q => // warm
      try q.impl(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    val times = defs.map { q =>
      System.gc()
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        q.impl(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      q.name -> runs.min
    }
    val qs = times.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(s"""{"metric":"llm_total","value":${times.map(_._2).sum},"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
