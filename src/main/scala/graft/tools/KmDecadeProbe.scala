package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r10 verdict #6: the clustering family's FOURTH decade, exercised
  * through the persisted-model artifact path — train ONCE at 2M
  * vectors / k=4096, saveCentroids → loadCentroids, then SERVE a 20M-
  * vector corpus with the stateless nearestCentroid expression (the
  * train-once/serve-forever split dedup/ANN already have decade
  * evidence for). All vectors ride the x14 shape: JL-projected 64→16
  * dims, map-only, fused into the serving scan.
  *
  * args: [serveFactor] [trainFactor] [k] — the sf0.1 embeddings table
  * is 2000 rows, so 20M = factor 10000, 2M = factor 1000.
  */
object KmDecadeProbe {
  def main(args: Array[String]): Unit = {
    val serveF = args.headOption.map(_.toInt).getOrElse(4000)
    val trainF = args.drop(1).headOption.map(_.toInt).getOrElse(400)
    val kk = args.drop(2).headOption.map(_.toInt).getOrElse(4096)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[kmdecade] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    def amplified(f: Int): String = {
      val dir = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_kmdecade_x$f.parquet")
      if (!dir.exists())
        t(s"amplify x$f write")(
          graft.tools.Amplify.embeddings(
              spark.read.parquet(s"$sfDir/embeddings.parquet"), f)
            .repartition(64)
            .write.mode("overwrite").parquet(dir.getAbsolutePath))
      dir.getAbsolutePath
    }
    def projected(path: String) = graft.ops.Clustering.randomProjectVec(
        spark.read.parquet(path), "vec_id", "embedding", dim = 64, outDim = 16)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as float))").as("embedding"))

    val baseN = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    val trainPath = amplified(trainF)
    val cents = t(s"train k=$kk on ${trainF * baseN} vecs (iters=1)")(
      graft.ops.Clustering.kmeansCentroids(
        projected(trainPath), "vec_id", "embedding", k = kk, iters = 1))
    println(s"[kmdecade] model: ${cents.length} centroids x ${cents.head._2.length} dims " +
      f"(${cents.length * cents.head._2.length * 8 / 1024.0}%.0f KiB driver state)")
    val modelDir = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_kmdecade_model_k$kk").getAbsolutePath
    t("saveCentroids")(graft.ops.Clustering.saveCentroids(spark, cents, modelDir))
    val loaded = t("loadCentroids")(graft.ops.Clustering.loadCentroids(spark, modelDir))

    val servePath = amplified(serveF)
    val served = t(s"SERVE ${serveF * baseN} vecs (JL + nearestCentroid, map-only)")(
      projected(servePath)
        .select(col("vec_id"),
          graft.ops.Clustering.nearestCentroid(col("embedding"), loaded).as("b"))
        .select(col("b.cid").as("cluster"), col("b.dist").as("dist"))
        .agg(count(lit(1)).as("n"), countDistinct(col("cluster")).as("live"),
          min("dist"), max("dist"))
        .collect().head)
    println(s"[kmdecade] served: $served")
    val rt = java.lang.Runtime.getRuntime
    println(f"[kmdecade] driver heap used ${(rt.totalMemory - rt.freeMemory) / 1e9}%.1f GB of ${rt.maxMemory / 1e9}%.1f GB max")
    spark.stop()
  }
}
