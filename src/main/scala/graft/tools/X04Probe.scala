package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Where does x04_ivf_ann spend its time? Separates quantizer training,
  * corpus assignment, probe join, and the top-k aggregate. */
object X04Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Unit): Unit = {
      f // warm
      System.gc()
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[x04probe] $label%-22s min=${runs.min}%.3f runs=${runs.map(r => f"$r%.3f").mkString(",")}")
    }

    def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    def queries = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") < 200)

    time("corpus_scan") { emb.write.format("noop").mode("overwrite").save() }
    time("train_iters1") { Similarity.ivfCentroids(emb, 64, 64, iters = 1) }
    time("train_iters0") { Similarity.ivfCentroids(emb, 64, 64, iters = 0) }
    time("full_ivf") {
      Similarity.ivfTopK(emb, queries, dim = 64, k = 10,
        nLists = 64, nProbe = 8, iters = 1)
        .write.format("noop").mode("overwrite").save()
    }
    println("[x04probe] corpus rows = " + emb.count())
    spark.stop()
  }
}
