package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the written-at-rest answer to the exchange-bound Layer-A
  * queries (SCALE.md round-7 crossover table): on a derived SF dir,
  * write lineitem/orders bucketed by the join/window key once, then
  * time the a06/a08/a16 plan shapes on the bucketed layout vs the flat
  * parquet — quantifying how much of the Spark-vs-DuckDB local gap is
  * the shuffle a bucketed deployment never pays.
  *
  * Usage: runMain graft.tools.BucketProbe <sfDir> [buckets]
  */
object BucketProbe {
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
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/root/repo/tmp/bucket-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rmTable(t: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"/root/repo/tmp/bucket-warehouse/$t")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      if (dir.exists()) rm(dir)
    }

    def time[A](what: String, reps: Int)(f: => A): Double = {
      val runs = (1 to reps).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      val best = runs.min
      println(f"[bucketprobe] $what%-28s min=${best}%.3f s  runs=${runs.map(r => f"$r%.2f").mkString(",")}")
      best
    }

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")

    // one-time layout cost (reported, not part of query timings)
    rmTable("bp_lineitem")
    rmTable("bp_orders")
    val tWriteLi = time("write lineitem bucketed", 1) {
      li.write.bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("bp_lineitem")
    }
    val tWriteOrd = time("write orders bucketed", 1) {
      ord.write.bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("bp_orders")
    }
    println(f"[bucketprobe] one-time layout cost: ${tWriteLi + tWriteOrd}%.1f s")

    val bli = spark.table("bp_lineitem")
    val bord = spark.table("bp_orders")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // a06 shape: lineitem ⋈ orders on orderkey + group-by orderkey agg
    def a06(l: org.apache.spark.sql.DataFrame, o: org.apache.spark.sql.DataFrame) =
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"), max(col("o_totalprice")).as("top"))

    // a08 shape: lineitem self-join on orderkey, different lines
    def a08(l: org.apache.spark.sql.DataFrame) = {
      val a = l.select(col("l_orderkey"), col("l_linenumber").as("ln_a"),
        col("l_partkey").as("pk_a"))
      val b = l.select(col("l_orderkey"), col("l_linenumber").as("ln_b"),
        col("l_partkey").as("pk_b"))
      a.join(b, Seq("l_orderkey")).filter(col("ln_a") < col("ln_b"))
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("pairs"))
    }

    // a16 shape: COUNT(*) OVER (PARTITION BY l_orderkey)
    def a16(l: org.apache.spark.sql.DataFrame) =
      l.select(col("l_orderkey"), col("l_quantity"),
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_orderkey"))).as("n"))

    // warmups
    noop(a06(li, ord)); noop(a06(bli, bord))
    val f06 = time("a06 flat", 3)(noop(a06(li, ord)))
    val b06 = time("a06 bucketed", 3)(noop(a06(bli, bord)))
    noop(a08(li)); noop(a08(bli))
    val f08 = time("a08 flat", 3)(noop(a08(li)))
    val b08 = time("a08 bucketed", 3)(noop(a08(bli)))
    noop(a16(li)); noop(a16(bli))
    val f16 = time("a16 flat", 3)(noop(a16(li)))
    val b16 = time("a16 bucketed", 3)(noop(a16(bli)))

    println(f"[bucketprobe] summary sfDir=$sfDir buckets=$buckets")
    println(f"[bucketprobe] a06 flat=$f06%.3f bucketed=$b06%.3f (${f06 / b06}%.2fx)")
    println(f"[bucketprobe] a08 flat=$f08%.3f bucketed=$b08%.3f (${f08 / b08}%.2fx)")
    println(f"[bucketprobe] a16 flat=$f16%.3f bucketed=$b16%.3f (${f16 / b16}%.2fx)")
    spark.stop()
  }
}
