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
      for (q <- BucketedTables.queries if !q.name.startsWith("k71")) {
        val df = q.impl(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val plan = df.queryExecution.executedPlan.toString
        // shuffle exchanges render as "Exchange hashpartitioning" in
        // plan strings (the r9 "ShuffleExchange" needle never matched
        // anything — vacuous pin, caught and fixed r10)
        assert(!plan.contains("Exchange hashpartitioning"),
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

  test("k71: bucketed embeddings elide semDedup's corpus zipper exchange") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    import org.apache.spark.sql.functions.col
    // The candidate join's (cluster, ti, tj) shuffle is semantic and
    // stays either way; the (assignment ⋈ input) zipper on vec_id —
    // the one exchange where BOTH sides are corpus-sized — must
    // disappear over the vec_id-bucketed layout. semDedup hides the
    // zipper behind a localCheckpoint, so pin its exact join shape
    // directly; broadcasts are disabled because at test scale AQE
    // would broadcast the tiny table and mask the exchange question
    // entirely (at 100 TB neither side broadcasts — that's the point).
    def zipperExchanges(src: org.apache.spark.sql.DataFrame): Int = {
      val assigned = graft.ops.Clustering
        .kmeans(src, "vec_id", "embedding", k = 4, iters = 1)
        .select(col("vec_id"), col("cluster"))
      val zipper = src.select(col("vec_id").cast("long").as("vec_id"),
          col("embedding").cast("array<float>").as("emb"))
        .join(assigned, "vec_id")
      zipper.write.format("noop").mode("overwrite").save()
      "Exchange hashpartitioning".r.findAllIn(
        zipper.queryExecution.executedPlan.toString).size
    }
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      BucketedTables.ensure(spark, sfDir)
      val nBucketed = zipperExchanges(
        spark.table(BucketedTables.testTableName(sfDir, "embeddings")))
      val nRaw = zipperExchanges(Tables.embeddings(spark, sfDir))
      assert(nBucketed == 0 && nRaw > 0,
        s"expected 0 bucketed vs >0 raw zipper exchanges: $nBucketed vs $nRaw")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }
}
