package graft.tools
import org.apache.spark.sql.SparkSession
object X16Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.queries.BenchHeavy.queries
      .find(_.name == "x16_ivf_serve_partitioned").get
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // first run builds the artifacts; time the second (steady-state)
    q.impl(spark, d).write.format("noop").mode("overwrite").save()
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      q.impl(spark, d).write.format("noop").mode("overwrite").save()
      println(f"[x16] run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val df = q.impl(spark, d)
    df.write.format("noop").mode("overwrite").save()
    println(df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("PartitionFilters") || l.contains("PartitionCount"))
      .mkString("\n").take(1200))
    println("[x16] rows=" + df.count())
    spark.stop()
  }
}
