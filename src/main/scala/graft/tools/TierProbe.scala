package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone Layer-A tier timer: the Bench sf1/sf10 sections in
  * isolation (same session config as graft.Bench, same warm-up +
  * best-of-3 contract) so a derived-tier number can be measured on a
  * quiet box without paying the full suite. Args: dir [reps].
  */
object TierProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft_bench_sf1__root_testdata_sf0_1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("TIER_PARTS", cpus)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.shuffle.compress",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_COMPRESS", "false"))
      .config("spark.shuffle.spill.compress",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_COMPRESS", "false"))
      .config("spark.ui.enabled", "false")
    // A/B hook: TIER_CONF="key=value;key=value" overlays arbitrary
    // session confs for floor experiments (r13 verdict #4).
    val spark = sys.env.get("TIER_CONF").map(_.split(";").toSeq).getOrElse(Nil)
      .map(_.split("=", 2)).collect { case Array(k, v) => (k.trim, v.trim) }
      .foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.FramelessWindowStrategy.install(spark)
    val layerA = graft.SparkEntry.benchQueries
    layerA.foreach { q =>
      try q.impl(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"[tier] warm ${q.name}: $e") }
      System.gc()
    }
    var total = 0.0
    layerA.foreach { q =>
      System.gc()
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        q.impl(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      total += runs.min
      println(f"[tier] ${q.name}: min=${runs.min}%.3f  all=${runs.map(r => f"$r%.3f").mkString(",")}")
    }
    println(f"[tier] total: $total%.3f  ($dir)")
    spark.stop()
  }
}
