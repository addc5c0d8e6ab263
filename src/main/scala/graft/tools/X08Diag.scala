package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic for the x08 bucket structure at a probe factor:
  * bucket-size distribution of the shard-vs-index band join, and the
  * cross-side pair count the verify step actually pays.
  */
object X08Diag {
  def main(args: Array[String]): Unit = {
    val f = args.lift(0).getOrElse("100").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(
      new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_curateprobe_x$f.parquet").getAbsolutePath)
    val bkt = graft.ops.Sampling.hashBucket(col("text"))
    // compact one-row-per-doc index form (id, shs, band_hashes) —
    // exploded to band keys the same way the serve path does
    val index = graft.ops.Dedup.explodeBanded(spark.read.parquet(new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_curate2_mhindexc_x$f.parquet")
      .getAbsolutePath))
    val shard = graft.ops.Dedup.explodeBanded(
      graft.ops.Dedup.minhashIndex(docs.filter(bkt >= 9000), "doc_id", "text"))
    val both = index.select(col("band"), col("band_hash"), lit(0).as("side"))
      .unionByName(shard.select(col("band"), col("band_hash"), lit(1).as("side")))
    val stats = both.groupBy("band", "band_hash")
      .agg(count(lit(1)).as("n"),
        sum(col("side")).as("n_new"))
      .agg(count(lit(1)).as("buckets"),
        sum(col("n")).as("rows"),
        max(col("n")).as("max_bucket"),
        expr("percentile_approx(n, 0.99)").as("p99"),
        sum(col("n_new") * (col("n") - col("n_new"))).as("cross_pairs"),
        sum(when(col("n_new") > 0, 1).otherwise(0)).as("touched"))
    stats.show(false)
    spark.stop()
  }
}
