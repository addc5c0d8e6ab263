package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: native TypedImperativeAggregate vs udaf(Aggregator). */
object AggProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val iv = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet").select(
      col("l_returnflag").as("grp"),
      (col("l_orderkey") % 100000).as("s"),
      (col("l_orderkey") % 100000 + col("l_quantity").cast("long")).as("e"))

    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.write.format("noop").mode("overwrite").save()
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"AGG $name: ${runs.min}%.3f")
    }
    time("udaf") {
      iv.groupBy("grp").agg(graft.functions.CompressIntervals
        .compressIntervalsUdaf(col("s"), col("e")).as("iv"))
    }
    time("native") {
      iv.groupBy("grp").agg(graft.functions.CompressIntervals
        .compressIntervals(col("s"), col("e")).as("iv"))
    }
    spark.stop()
  }
}
