package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** IVF ANN another decade up: Amplify-derived rotation-disjoint
  * embedding corpora (×100 / ×1000 over sf0.1's 20k = 2M vectors at
  * the top), nLists scaled with sqrt(corpus) as a deployment would.
  *
  * Usage: runMain graft.tools.IvfScaleProbe [sfDir] [factors]
  */
object IvfScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("100,1000").split(",").map(_.toInt)
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
      val dir = new java.io.File(
        sys.props("java.io.tmpdir"), s"graft_emb_x$f.parquet")
      if (!dir.exists())
        Amplify.embeddings(
            spark.read.parquet(s"$sfDir/embeddings.parquet"), f)
          .repartition(spark.sparkContext.defaultParallelism)
          .write.mode("overwrite").parquet(dir.getAbsolutePath)
      val emb = spark.read.parquet(dir.getAbsolutePath)
      val n = emb.count()
      val nLists = math.max(64, math.sqrt(n.toDouble).toInt / 8 * 8)
      val queries = emb.filter(col("vec_id") < 200)
      def ivf() = Similarity.ivfTopK(emb, queries, dim = 64, k = 10,
          nLists = nLists, nProbe = math.max(8, nLists / 16), iters = 1)
        .write.format("noop").mode("overwrite").save()
      ivf() // warm-up (includes centroid training both times; ivfTopK is one-shot)
      val t = (1 to 2).map(_ => time(ivf())).min
      println(f"PROBE ivf x$f%d n=$n%d nLists=$nLists%d t=$t%.1f s")
    }
    spark.stop()
  }
}
