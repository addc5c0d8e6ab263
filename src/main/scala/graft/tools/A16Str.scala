package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object A16Str {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.FramelessWindowStrategy.install(spark)
    // high-cardinality STRING partition key (non-radix-sortable): the
    // one shape where the hash-join form could still beat the sort
    val li = spark.read.parquet("/root/repo/tmp/sf10/lineitem.parquet")
      .select(col("l_linenumber"), md5(col("l_orderkey").cast("string")).as("k"))
    def q() = li.select(col("k"), col("l_linenumber"),
      count(lit(1)).over(Window.partitionBy(col("k"))).as("cnt"))
      .write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Unit = {
      f; System.gc()
      val runs = (1 to 3).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"PROBE $name: min=${runs.min}%.3f avg=${runs.sum / 3}%.3f")
    }
    spark.conf.set(graft.plans.FramelessWindowStrategy.EnabledKey, "false")
    time("str_window_sort")(q())
    spark.conf.set(graft.plans.FramelessWindowStrategy.EnabledKey, "true")
    spark.conf.set(graft.plans.FramelessWindowStrategy.ForceKey, "true")
    time("str_window_hash_join")(q())
    spark.stop()
  }
}
