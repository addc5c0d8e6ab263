package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.kernel.TextKernel

/** Counts MinHash LSH candidate pairs (and the byte volume the verify
  * join must move) at a given SF dir — diagnoses superlinear candidate
  * growth without running the full verify join.
  */
object PairCountProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val minhashUdf = udf((text: String, shingleN: Int, numHashes: Int) =>
      TextKernel.minhashSignature(TextKernel.shingleHashes(text, shingleN), numHashes))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    val sigs = docs.select(col("doc_id").as("id"),
      minhashUdf(col("text"), lit(5), lit(64)).as("sig"))
    val banded = sigs.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(15)),
        b => hash(slice(col("sig"), b * 4 + 1, lit(4)), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
    val keys = banded.select(col("band"), col("band_hash"), col("id"))
    // bucket-size histogram: candidate occurrences = sum s*(s-1)/2
    val buckets = keys.groupBy("band", "band_hash").agg(count(lit(1)).as("s"))
    val occ = buckets.agg(
      sum(col("s") * (col("s") - 1) / 2).as("cand_occurrences"),
      max(col("s")).as("max_bucket"),
      count(lit(1)).as("n_buckets")).collect()(0)
    println(s"[paircount] docs=${docs.count()} cand_occurrences=${occ.get(0)} " +
      s"max_bucket=${occ.get(1)} n_buckets=${occ.get(2)}")
    val distinctPairs = keys.select(col("band"), col("band_hash"), col("id").as("id_a"))
      .join(keys.select(col("band"), col("band_hash"), col("id").as("id_b")),
        Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct().count()
    println(s"[paircount] distinct_pairs=$distinctPairs")
    spark.stop()
  }
}
