package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: a06 (Q3-shape join+agg) plan alternatives at the
  * derived SFs. The keys-only broadcast form won at sf0.1, but at sf10
  * the broadcast carries ~3M keys and the map-side partial aggregate
  * runs at full key cardinality (60M rows over 15M groups — each task
  * sees mostly-distinct keys, so partial agg barely reduces and the
  * exchange moves nearly one row per input row anyway). Candidates:
  * shuffle join on the orderkey with the agg reusing the join's
  * partitioning (one lineitem exchange, no broadcast build), with both
  * semi-filter orders variants. Not part of the driver contract.
  */
object A06Probe {
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

    def time(name: String)(f: => Unit): Unit = {
      f
      System.gc()
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name: min=${runs.min}%.3f avg=${runs.sum / 3}%.3f")
    }

    // LayerA1.cents, inlined (private[queries])
    def cents(name: String) = floor(col(name) * 100 + 0.5).cast("long")
    def cust() = spark.read.parquet(s"$sfDir/customer.parquet")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    def orders() = spark.read.parquet(s"$sfDir/orders.parquet")
    def li() = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def revAgg(joined: org.apache.spark.sql.DataFrame) = joined
      .groupBy(col("o_orderkey"))
      .agg((sum(cents("l_extendedprice") * (lit(100L) - cents("l_discount")))
        .cast("double") / 10000.0).as("rev"))

    time("bcast_keys (current)") {
      val ok = broadcast(orders()
        .join(broadcast(cust()), col("c_custkey") === col("o_custkey"), "leftsemi")
        .select("o_orderkey"))
      revAgg(li().join(ok, col("l_orderkey") === col("o_orderkey")))
        .write.format("noop").mode("overwrite").save()
    }

    time("shuffle_hash_join") {
      val ok = orders()
        .join(broadcast(cust()), col("c_custkey") === col("o_custkey"), "leftsemi")
        .select("o_orderkey")
      revAgg(li().hint("SHUFFLE_HASH")
        .join(ok.hint("SHUFFLE_HASH"), col("l_orderkey") === col("o_orderkey")))
        .write.format("noop").mode("overwrite").save()
    }

    time("bcast_semi_filter_then_shuffle_agg") {
      // broadcast the key set only as a FILTER (leftsemi, map-side) so
      // the exchange carries the ~1/5 surviving lineitem rows; the agg
      // groups post-shuffle on the already-filtered stream. o_orderkey
      // is recovered by aliasing the (equal) l_orderkey.
      val ok = broadcast(orders()
        .join(broadcast(cust()), col("c_custkey") === col("o_custkey"), "leftsemi")
        .select("o_orderkey"))
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .join(ok, col("l_orderkey") === col("o_orderkey"), "leftsemi")
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg((sum(cents("l_extendedprice") * (lit(100L) - cents("l_discount")))
          .cast("double") / 10000.0).as("rev"))
        .write.format("noop").mode("overwrite").save()
    }

    time("bcast_semi_repartition_agg") {
      // same map-side semi filter, but an explicit repartition on the
      // group key moves the partial aggregate AFTER the exchange: the
      // scan stage carries no 3M-entry hash map, the exchange moves
      // narrow raw rows, and the post-shuffle agg sees co-located keys
      val ok = broadcast(orders()
        .join(broadcast(cust()), col("c_custkey") === col("o_custkey"), "leftsemi")
        .select("o_orderkey"))
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .join(ok, col("l_orderkey") === col("o_orderkey"), "leftsemi")
        .select(col("l_orderkey").as("o_orderkey"),
          (cents("l_extendedprice") * (lit(100L) - cents("l_discount"))).as("c"))
        .repartition(col("o_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg((sum(col("c")).cast("double") / 10000.0).as("rev"))
        .write.format("noop").mode("overwrite").save()
    }

    time("agg_first_then_semi") {
      // pre-aggregate lineitem per orderkey (same partial-agg
      // cardinality problem, but the join probe shrinks to 15M rows)
      val la = li().groupBy(col("l_orderkey"))
        .agg(sum(cents("l_extendedprice") * (lit(100L) - cents("l_discount"))).as("c"))
      val ok = orders()
        .join(broadcast(cust()), col("c_custkey") === col("o_custkey"), "leftsemi")
        .select("o_orderkey")
      la.hint("SHUFFLE_HASH").join(ok.hint("SHUFFLE_HASH"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey"), (col("c").cast("double") / 10000.0).as("rev"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
