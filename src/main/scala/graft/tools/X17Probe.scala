package graft.tools
import org.apache.spark.sql.SparkSession
object X17Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.queries.BenchHeavy.queries.find(_.name == "x17_winnow_pairs").get
    val d = "/root/testdata/sf0.1"
    q.impl(spark, d).write.format("noop").mode("overwrite").save()
    for (i <- 1 to 2) {
      System.gc()
      val t0 = System.nanoTime()
      q.impl(spark, d).write.format("noop").mode("overwrite").save()
      println(f"[x17] run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    println("[x17] result: " + q.impl(spark, d).collect().mkString(","))
    spark.stop()
  }
}
