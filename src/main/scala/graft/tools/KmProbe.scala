package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing for the x14 clustering pipeline (r9): where do 60 s go
  * at 50k×16 dims? Times (a) the JL projection materialization,
  * (b) kmeans alone, (c) the within-cluster pair join, separately,
  * plus cluster-size skew (the candidate join is O(Σ cluster²)).
  */
object KmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[kmprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // args: [factor] [k] — factor amplifies the sf0.1 embeddings
    // (2000 rows) via Amplify.embeddings; default is the x14 workload
    // (×25 = 50k vectors, k=64)
    val factor = args.headOption.map(_.toInt).getOrElse(25)
    val kk = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_kmprobe_x$factor.parquet")
    if (!dir.exists())
      graft.tools.Amplify.embeddings(
          spark.read.parquet(s"$sfDir/embeddings.parquet"), factor)
        .repartition(32)
        .write.mode("overwrite").parquet(dir.getAbsolutePath)
    println(s"[kmprobe] factor=$factor k=$kk")
    val emb = spark.read.parquet(dir.getAbsolutePath)
    val proj = graft.ops.Clustering.randomProjectVec(
        emb, "vec_id", "embedding", dim = 64, outDim = 16)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as float))").as("embedding"))
      .localCheckpoint()
    t("proj count")(println(proj.count()))
    val assigned = t("kmeans iters=2")(
      graft.ops.Clustering.kmeans(proj, "vec_id", "embedding",
        k = kk, iters = 2).localCheckpoint())
    t("cluster skew")(
      assigned.groupBy("cluster").count()
        .agg(min("count"), max("count"), count(lit(1))).show())
    val vecs = proj.join(assigned.select("vec_id", "cluster"), "vec_id")
      .withColumn("nrm", graft.ops.Similarity.norm(col("embedding")))
      .localCheckpoint()
    val a = vecs.select(col("cluster"), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"), col("nrm").as("nrm_a"))
    val b = vecs.select(col("cluster"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"), col("nrm").as("nrm_b"))
    t("pair join count")(println(
      a.join(b, Seq("cluster")).filter(col("id_a") < col("id_b")).count()))
    t("pair join + cos filter")(println(
      a.join(b, Seq("cluster")).filter(col("id_a") < col("id_b"))
        .filter(graft.ops.Similarity.dot(col("emb_a"), col("emb_b")) /
          (col("nrm_a") * col("nrm_b")) >= 0.99)
        .select(col("id_b")).distinct().count()))

    // the exact x14 composition, lazy proj (no checkpoint): reproduces
    // the 60 s? then bisect with a checkpointed proj
    val projLazy = graft.ops.Clustering.randomProjectVec(
        emb, "vec_id", "embedding", dim = 64, outDim = 16)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as float))").as("embedding"))
    t("composed, lazy proj")(
      graft.ops.Clustering.semDedup(projLazy, "vec_id", "embedding",
          k = kk, iters = 2, tau = 0.99)
        .groupBy(col("is_dup")).agg(count(lit(1)).as("n")).collect())
    t("composed, checkpointed proj")(
      graft.ops.Clustering.semDedup(proj, "vec_id", "embedding",
          k = kk, iters = 2, tau = 0.99)
        .groupBy(col("is_dup")).agg(count(lit(1)).as("n")).collect())
    spark.stop()
  }
}
