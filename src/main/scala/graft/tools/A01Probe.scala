package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: why is a01 (scan+agg over lineitem) nonlinear at the
  * derived sf10? Checks plan shape, scan parallelism, and the
  * maxPartitionBytes lever. Not part of the driver contract. */
object A01Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/tmp/sf10")
    val mpb = sys.env.getOrElse("PROBE_MPB", "134217728")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", mpb)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def cents(c: String) = round(col(c) * 100, 0).cast("long")

    val q = li.agg(
      count(lit(1)).as("n"),
      (sum(cents("l_extendedprice")).cast("double") / 100.0).as("sum_price"))
    q.explain("formatted")

    def time(name: String)(f: => Unit): Unit = {
      f
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name: min=${runs.min}%.3f avg=${runs.sum / 3}%.3f")
    }
    time(s"a01 mpb=$mpb") {
      q.write.format("noop").mode("overwrite").save()
    }
    // count-only twin: is it the scan or the agg expression?
    time("count_only") {
      li.agg(count(lit(1))).write.format("noop").mode("overwrite").save()
    }
    time("sum_double_only") {
      li.agg(sum(col("l_extendedprice"))).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
