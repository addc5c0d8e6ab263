package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the load-bearing property of the standing bucketed-at-rest
  * path (BucketedTables): with the layout materialized and the
  * bucketed-scan ordering conf on, every quartet plan runs with ZERO
  * shuffle exchanges (broadcasts of the 25-row dim are allowed — a
  * broadcast is the at-scale shape for small dims), and the merge
  * self-join needs no SortExec (the in-bucket sort order is consumed
  * as-is). Correctness of the quartet itself rides the driver gate —
  * k06/k08/k16/k19 share a06/a08/a16/a19's DuckDB oracles.
  */
class BucketedTablesSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("quartet plans have zero shuffle exchanges over the bucketed layout") {
    assume(new java.io.File(s"$sfDir/lineitem.parquet").exists())
    val prev = spark.conf.getOption(
      "spark.sql.legacy.bucketedTableScan.outputOrdering")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      BucketedTables.ensure(spark, sfDir)
      for (q <- BucketedTables.queries) {
        val df = q.impl(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("ShuffleExchange"),
          s"${q.name} shuffles:\n$plan")
        if (q.name.startsWith("k08"))
          assert(!plan.contains("Sort "),
            s"${q.name} re-sorts sorted buckets:\n$plan")
      }
    } finally prev match {
      case Some(v) => spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", v)
      case None => spark.conf.unset(
        "spark.sql.legacy.bucketedTableScan.outputOrdering")
    }
  }
}
