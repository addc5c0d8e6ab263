package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch perf probe: plan variants for the bench suite's heavy
  * queries (not part of the driver contract).
  */
object VariantProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("PROBE_AQE", "true"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")

    def time(name: String)(f: => DataFrame): Unit = {
      def run(): Unit = f.write.format("noop").mode("overwrite").save()
      run() // warm
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name%-24s min=${runs.min}%.3f med=${runs.sorted.apply(2)}%.3f")
    }

    def cents(name: String) = round(col(name) * 100, 0).cast("long")

    // --- a08 variants ---
    time("a08_current") {
      val l = li.select("l_orderkey", "l_linenumber")
      l.as("a").join(l.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey")
            && col("a.l_linenumber") < col("b.l_linenumber"))
        .select(col("a.l_orderkey").as("l_orderkey"),
          col("a.l_linenumber").as("ln_a"), col("b.l_linenumber").as("ln_b"))
    }
    time("a08_shuffleHash") {
      val l = li.select("l_orderkey", "l_linenumber")
      l.as("a").hint("SHUFFLE_HASH").join(l.as("b").hint("SHUFFLE_HASH"),
          col("a.l_orderkey") === col("b.l_orderkey")
            && col("a.l_linenumber") < col("b.l_linenumber"))
        .select(col("a.l_orderkey").as("l_orderkey"),
          col("a.l_linenumber").as("ln_a"), col("b.l_linenumber").as("ln_b"))
    }
    time("a08_repartThenBcast") {
      val l = li.select("l_orderkey", "l_linenumber")
      val a = l.repartition(32)
      a.as("a").join(broadcast(l.as("b")),
          col("a.l_orderkey") === col("b.l_orderkey")
            && col("a.l_linenumber") < col("b.l_linenumber"))
        .select(col("a.l_orderkey").as("l_orderkey"),
          col("a.l_linenumber").as("ln_a"), col("b.l_linenumber").as("ln_b"))
    }
    time("a08_groupExplode") {
      li.groupBy("l_orderkey")
        .agg(collect_list(col("l_linenumber")).as("lns"))
        .select(col("l_orderkey"),
          explode(flatten(transform(col("lns"), a =>
            transform(filter(col("lns"), b => a < b),
              b => struct(a.as("ln_a"), b.as("ln_b")))))).as("p"))
        .select(col("l_orderkey"), col("p.ln_a").as("ln_a"), col("p.ln_b").as("ln_b"))
    }

    // --- a06 variants ---
    time("a06_current") {
      val c = cust.filter(col("c_mktsegment") === "BUILDING")
      val co = broadcast(c.join(orders, col("c_custkey") === col("o_custkey")))
      li.join(co, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg((sum(cents("l_extendedprice") * (lit(100L) - cents("l_discount")))
          .cast("double") / 10000.0).as("rev"))
    }
    time("a06_noHint") {
      val c = cust.filter(col("c_mktsegment") === "BUILDING")
      val co = c.join(orders, col("c_custkey") === col("o_custkey"))
      li.join(co, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg((sum(cents("l_extendedprice") * (lit(100L) - cents("l_discount")))
          .cast("double") / 10000.0).as("rev"))
    }
    time("a06_semiKeysOnly") {
      val c = cust.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ok = broadcast(orders.join(broadcast(c),
        col("c_custkey") === col("o_custkey"), "leftsemi").select("o_orderkey"))
      li.join(ok, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg((sum(cents("l_extendedprice") * (lit(100L) - cents("l_discount")))
          .cast("double") / 10000.0).as("rev"))
    }

    // --- a01 / a11 as-is for overhead reference ---
    time("a01_current") {
      li.agg(count(lit(1)).as("n"),
        (sum(cents("l_extendedprice")).cast("double") / 100.0).as("sum_price"))
    }
    time("a11_current") {
      li.filter(col("l_shipdate") <= expr("TIMESTAMP_NTZ '1998-09-02 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          (sum(cents("l_quantity")).cast("double") / 100.0).as("sum_qty"),
          (sum(cents("l_extendedprice")).cast("double") / 100.0).as("sum_base_price"),
          (sum(cents("l_extendedprice") * (lit(100L) - cents("l_discount")))
            .cast("double") / 10000.0).as("sum_disc_price"),
          (sum(cents("l_extendedprice") * (lit(100L) - cents("l_discount"))
            * (lit(100L) + cents("l_tax"))).cast("double") / 1000000.0).as("sum_charge"),
          (sum(cents("l_quantity")).cast("double") / 100.0 / count(lit(1))).as("avg_qty"),
          (sum(cents("l_extendedprice")).cast("double") / 100.0 / count(lit(1))).as("avg_price"),
          (sum(cents("l_discount")).cast("double") / 100.0 / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }

    time("a04_current") {
      li.filter(col("l_discount").between(0.05, 0.07)
        && col("l_quantity") < 24
        && col("l_returnflag").isin("A", "R"))
        .select("l_orderkey", "l_linenumber")
    }
    time("a16_current") {
      import org.apache.spark.sql.expressions.Window
      li.select(col("l_orderkey"), col("l_linenumber"),
        count(lit(1)).over(Window.partitionBy(col("l_orderkey"))).as("cnt"))
    }
    time("a19_current") {
      import org.apache.spark.sql.expressions.Window
      val wRank = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc)
      val wSum = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey")).rowsBetween(-2, 0)
      orders.select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        rank().over(wRank).cast("long").as("rnk"),
        (sum(cents("o_totalprice")).over(wSum).cast("double") / 100.0).as("run_sum"))
    }

    if (sys.env.contains("PROBE_EXPLAIN")) {
      val l = li.select("l_orderkey", "l_linenumber")
      l.as("a").join(l.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey")
            && col("a.l_linenumber") < col("b.l_linenumber"))
        .select(col("a.l_orderkey"), col("a.l_linenumber"), col("b.l_linenumber"))
        .explain("formatted")
    }

    spark.stop()
  }
}
