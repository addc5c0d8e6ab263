package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan audit for the round-7 curation queries (l41-l44): prints each
  * formatted plan so ReadSchema pruning, broadcast placement, and
  * shuffle count can be eyeballed and recorded in SCALE.md.
  */
object CurationPlanProbe {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- Seq("l41_curation_rules", "l42_token_budget_mix",
        "l43_curation_pipeline", "l44_adaptive_cut")) {
      println(s"===== $name =====")
      graft.SparkEntry.queries(name)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
