package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bench-only data amplifier: replicates the driver's sf0.1 tables N×
  * into a derived directory, shifting every join/partition key by
  * `rep * KEY_OFFSET` so each replica is a disjoint key universe —
  * the same linear scaling TPC-H itself uses (customer/orders/lineitem
  * grow with SF; group-key domains like returnflag/linestatus stay
  * fixed). Join fan-outs, window partition counts and self-join pair
  * expansions all scale exactly 10×, so a bench at the derived sf1 is
  * a faithful 10× workload, not 10 copies of the same answer.
  *
  * This exists ONLY to demonstrate the Spark-vs-DuckDB crossover at a
  * scale where per-query fixed overhead stops dominating (VERDICT r4,
  * Next #6). Correctness testing still runs exclusively on the
  * driver-generated /root/testdata parquet.
  */
object ScaleUp {
  /** Above every key in sf0.1 (max l_orderkey ~ 6e5) and big enough
    * that 1000 replicas stay far from Long overflow. */
  val KeyOffset = 10000000L

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/root/repo/tmp/sf1")
    val n = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val reps = spark.range(n).toDF("rep")
    def scale(name: String, keys: Set[String]): Unit = {
      val df = spark.read.parquet(s"$src/$name.parquet")
      val out = df
        .crossJoin(broadcast(reps))
        .select(df.columns.map { c =>
          if (keys(c)) (col(c) + col("rep") * KeyOffset).as(c) else col(c)
        }: _*)
      // repartition: parallel write + many row groups, so downstream
      // scans get real task parallelism (the sf0.1 files are
      // single-row-group; see SCALE.md "Local-mode honesty").
      out.repartition(32).write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name -> $dst/$name.parquet (x$n)")
    }

    scale("customer", Set("c_custkey"))
    scale("orders", Set("o_orderkey", "o_custkey"))
    scale("lineitem", Set("l_orderkey", "l_partkey", "l_suppkey"))
    spark.stop()
  }
}
