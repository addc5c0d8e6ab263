package graft.tools
import org.apache.spark.sql.SparkSession
object X12Var {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = spark.read.parquet("/tmp/graft_bench_documents_x10_root_testdata_sf0_1.parquet")
    def t[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[x12v] $l: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm
    val mergesW = graft.ops.BpeTrainer.trainMergesAuto(docs, "text", 30)
    graft.ops.BpeTrainer.packTokenIds(docs, "doc_id", "text", mergesW, 2048, 64)
      .write.format("noop").mode("overwrite").save()
    for (i <- 1 to 3) {
      System.gc()
      val merges = t(s"train $i")(graft.ops.BpeTrainer.trainMergesAuto(docs, "text", 30))
      t(s"pack  $i")(graft.ops.BpeTrainer.packTokenIds(docs, "doc_id", "text", merges, 2048, 64)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
