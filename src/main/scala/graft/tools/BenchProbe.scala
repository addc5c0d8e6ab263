package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch perf probe (not part of the driver contract). */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val parts = sys.env.getOrElse("PROBE_PARTS", "32")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("PROBE_AQE", "true"))
      .config("spark.sql.join.preferSortMergeJoin", sys.env.getOrElse("PROBE_SMJ", "true"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")

    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name: min=${runs.min}%.3f avg=${runs.sum / 3}%.3f")
    }

    def dec2(c: String) = col(c).cast("decimal(18,2)")
    val filtered = li.filter(col("l_shipdate") <= expr("TIMESTAMP_NTZ '1998-09-02 00:00:00'"))

    time("a08_self_join") {
      val l = li.select("l_orderkey", "l_linenumber")
      l.as("a").join(l.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey")
            && col("a.l_linenumber") < col("b.l_linenumber"))
        .select(col("a.l_orderkey"), col("a.l_linenumber"), col("b.l_linenumber"))
        .write.format("noop").mode("overwrite").save()
    }

    time("a11_decimal") {
      filtered.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(dec2("l_quantity")).cast("double").as("sq"),
          sum(dec2("l_extendedprice")).cast("double").as("sb"),
          sum(dec2("l_extendedprice") * (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)"))).cast("double"),
          count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    time("a11_double") {
      filtered.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")).as("sq"),
          sum(col("l_extendedprice")).as("sb"),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
          count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    time("a01_agg_only") {
      li.agg(count(lit(1)), sum(dec2("l_extendedprice")).cast("double"))
        .write.format("noop").mode("overwrite").save()
    }
    time("noop_baseline") {
      spark.range(1).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
