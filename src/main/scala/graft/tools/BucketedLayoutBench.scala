package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The bucketed-at-rest counterpart of the exchange-bound Layer-A
  * quartet (VERDICT r7: a06 4.2–5.3×, a08/a16/a19 2.6–3.1× DuckDB at
  * sf10, every gap = one full fact-table exchange DuckDB's in-process
  * pipeline never pays). This measures the LAYOUT answer: materialize
  * lineitem/orders bucketed on their join/partition keys once
  * (the 100 TB deployment shape — pay the shuffle at ingest, amortize
  * it over every downstream query), then run the same four query
  * shapes with ZERO runtime exchanges.
  *
  * Usage: runMain graft.tools.BucketedLayoutBench [sfDir] [buckets]
  * Prints per-query best-of-3 seconds + runtime exchange count, for
  * SCALE.md's Spark-bucketed vs DuckDB row.
  */
object BucketedLayoutBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/repo/tmp/sf10")
    val buckets = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      // Report the in-bucket sort order from one-file-per-bucket scans
      // (off by default since 3.0 because it lists files at planning
      // time; here the layout guarantees 1 file/bucket and the elided
      // 60M-row SortExec is the whole point of sortBy at write time)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      // persistent (derby) catalog: bucketing METADATA must survive
      // JVMs or every run re-pays the layout build — exactly the
      // ingest-vs-query amortization the experiment is about
      .enableHiveSupport()
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- one-time layout materialization (the ingest-side cost) ----
    // repartition on the bucket key first so each bucket is exactly ONE
    // file: the scan then reports per-bucket sort order and SortExec is
    // elided wherever the in-bucket sort matches (bucket pruning and
    // one-file-per-bucket are what make the layout pay off).
    def build(table: String, src: => DataFrame, key: String,
        sortCols: Seq[String]): Double =
      if (spark.catalog.tableExists(table)) 0.0
      else {
        // bucketing metadata lives in this JVM's in-memory catalog
        // only — a warehouse dir left by a previous run is unusable
        // (and blocks the CTAS), so rebuild from scratch
        val stale = new java.io.File(s"spark-warehouse/$table")
        if (stale.exists()) {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
          }
          rm(stale)
        }
        val t0 = System.nanoTime()
        src.repartition(buckets, col(key))
          .write.mode("overwrite")
          .bucketBy(buckets, key).sortBy(sortCols.head, sortCols.tail: _*)
          .saveAsTable(table)
        (System.nanoTime() - t0) / 1e9
      }
    val tL = build("bk_lineitem",
      spark.read.parquet(s"$sfDir/lineitem.parquet"),
      "l_orderkey", Seq("l_orderkey", "l_linenumber"))
    val tO = build("bk_orders",
      spark.read.parquet(s"$sfDir/orders.parquet"),
      "o_orderkey", Seq("o_orderkey"))
    val tOc = build("bk_orders_ck",
      spark.read.parquet(s"$sfDir/orders.parquet"),
      "o_custkey", Seq("o_custkey"))
    println(f"[bucketed] layout build: lineitem=$tL%.1f s orders=$tO%.1f s orders_ck=$tOc%.1f s")

    // diagnostic: is the in-bucket sort order actually reported?
    println("[bucketed] lineitem scan ordering: " +
      spark.table("bk_lineitem").queryExecution.executedPlan.outputOrdering)

    val li = spark.table("bk_lineitem")
    val ord = spark.table("bk_orders")
    val ordCk = spark.table("bk_orders_ck")
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    def cents(name: String) = floor(col(name) * 100 + 0.5).cast("long")

    // ---- the four shapes, re-expressed over the bucketed layout ----
    val shapes: Seq[(String, () => DataFrame)] = Seq(
      "a06_join_agg" -> (() => {
        val c = cust.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val ok = ord
          .join(broadcast(c), col("c_custkey") === col("o_custkey"), "leftsemi")
          .select("o_orderkey")
        // SHUFFLE_HASH by default: both sides are already co-bucketed
        // so neither hint adds an exchange, but SHJ's per-bucket hash
        // build (~3M/32 keys) beats MERGE's ok-side sort + merge
        // (measured 1.03 vs 1.36 s)
        sys.env.get("GRAFT_A06_JOIN") match {
          case Some("MERGE") =>
            li.join(ok.hint("MERGE"), col("l_orderkey") === col("o_orderkey"))
              .groupBy(col("o_orderkey"))
              .agg((sum(cents("l_extendedprice") * (lit(100L) - cents("l_discount")))
                .cast("double") / 10000.0).as("rev"))
          case Some("PREAGG") =>
            // group key == join key, join is key-semi → agg and join
            // commute: pre-aggregate lineitem in place (zero exchange,
            // bucketed) so the join probes 1 row/key instead of ~4
            li.groupBy(col("l_orderkey"))
              .agg((sum(cents("l_extendedprice") * (lit(100L) - cents("l_discount")))
                .cast("double") / 10000.0).as("rev"))
              .join(ok.hint("SHUFFLE_HASH"), col("l_orderkey") === col("o_orderkey"))
              .select(col("o_orderkey"), col("rev"))
          case _ =>
            li.join(ok.hint("SHUFFLE_HASH"), col("l_orderkey") === col("o_orderkey"))
              .groupBy(col("o_orderkey"))
              .agg((sum(cents("l_extendedprice") * (lit(100L) - cents("l_discount")))
                .cast("double") / 10000.0).as("rev"))
        }
      }),
      "a08_self_join" -> (() => {
        val l = li.select("l_orderkey", "l_linenumber")
        l.as("a").join(l.as("b").hint("MERGE"),
            col("a.l_orderkey") === col("b.l_orderkey")
              && col("a.l_linenumber") < col("b.l_linenumber"))
          .select(col("a.l_orderkey").as("l_orderkey"),
            col("a.l_linenumber").as("ln_a"),
            col("b.l_linenumber").as("ln_b"))
      }),
      "a16_window_count" -> (() =>
        li.select(col("l_orderkey"), col("l_linenumber"),
          count(lit(1)).over(Window.partitionBy(col("l_orderkey"))).as("cnt"))),
      "a19_rank_frame" -> (() => {
        val wRank = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc)
        val wSum = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey")).rowsBetween(-2, 0)
        ordCk.select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          rank().over(wRank).cast("long").as("rnk"),
          (sum(cents("o_totalprice")).over(wSum).cast("double") / 100.0).as("run_sum"))
      }))

    for ((name, mk) <- shapes) {
      def run(): Double = {
        System.gc()
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // warm-up
      val best = (1 to 3).map(_ => run()).min
      val executed = {
        val df = mk()
        df.write.format("noop").mode("overwrite").save()
        df.queryExecution.executedPlan.toString
      }
      val nExchange = "Exchange".r.findAllIn(executed).length
      println(f"[bucketed] $name%-18s best=$best%.3f s exchanges=$nExchange")
      if (sys.env.contains("GRAFT_BUCKET_EXPLAIN")) println(executed)
    }
    spark.stop()
  }
}
