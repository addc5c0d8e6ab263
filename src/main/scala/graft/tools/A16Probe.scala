package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch probe: COUNT(*) OVER (PARTITION BY k) plan alternatives.
  * WindowExec sorts every partition by the partition key (60M-row sort
  * at the derived sf10); a groupBy+join-back computes the same result
  * with a hash join instead of a sort. Not part of the driver contract. */
object A16Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/tmp/sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")

    def time(name: String)(f: => Unit): Unit = {
      f
      System.gc()
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name: min=${runs.min}%.3f avg=${runs.sum / 3}%.3f")
    }

    def winQuery() =
      li.select(col("l_orderkey"), col("l_linenumber"),
          count(lit(1)).over(Window.partitionBy(col("l_orderkey"))).as("cnt"))

    // what the size gate sees: the Window child's estimated size
    val childStats = winQuery().queryExecution.optimizedPlan.collectFirst {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w.child.stats.sizeInBytes
    }.getOrElse(BigInt(-1))
    println(s"PROBE child stats sizeInBytes=$childStats " +
      s"(gate default=${graft.plans.FramelessWindowStrategy.MinChildBytesDefault})")

    spark.conf.set(graft.plans.FramelessWindowStrategy.EnabledKey, "false")
    time("window_sort") {
      winQuery().write.format("noop").mode("overwrite").save()
    }
    spark.conf.set(graft.plans.FramelessWindowStrategy.EnabledKey, "true")
    // the probe measures the strategy's forms directly; bypass the
    // size and key-type gates
    spark.conf.set(graft.plans.FramelessWindowStrategy.ForceKey, "true")
    graft.plans.FramelessWindowStrategy.install(spark)
    spark.conf.set(graft.plans.FramelessWindowStrategy.ModeKey, "join")
    time("window_hash_join") {
      winQuery().write.format("noop").mode("overwrite").save()
    }
    spark.conf.set(graft.plans.FramelessWindowStrategy.ModeKey, "buffer")
    time("window_hash_buffer") {
      winQuery().write.format("noop").mode("overwrite").save()
    }
    spark.conf.set(graft.plans.FramelessWindowStrategy.EnabledKey, "false")
    time("groupby_joinback") {
      val base = li.select("l_orderkey", "l_linenumber")
      val cnts = base.groupBy("l_orderkey").agg(count(lit(1)).as("cnt"))
      base.hint("SHUFFLE_HASH").join(cnts.hint("SHUFFLE_HASH"), "l_orderkey")
        .select(col("l_orderkey"), col("l_linenumber"), col("cnt"))
        .write.format("noop").mode("overwrite").save()
    }
    time("broadcast_joinback") {
      val base = li.select("l_orderkey", "l_linenumber")
      val cnts = base.groupBy("l_orderkey").agg(count(lit(1)).as("cnt"))
      base.join(broadcast(cnts), "l_orderkey")
        .select(col("l_orderkey"), col("l_linenumber"), col("cnt"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
