package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ZipProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val assigned = graft.ops.Clustering.kmeans(src, "vec_id", "embedding", 4, 1)
      .select(col("vec_id"), col("cluster"))
    val zipper = src.select(col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<float>").as("emb"))
      .join(assigned, "vec_id")
    zipper.write.format("noop").mode("overwrite").save()
    println("=== PLAN ===")
    println(zipper.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
