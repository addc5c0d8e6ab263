package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape evidence for the SCALE.md co-location claim: a join
  * between two tables bucketed on the join key runs with ZERO shuffle
  * exchanges — the 100 TB path for repeated fact-to-fact joins.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("join on bucketed tables plans without any shuffle exchange") {
    import spark.implicits._
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity")
    spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
    spark.sql("DROP TABLE IF EXISTS graft_ord_bucketed")
    // DROP clears this JVM's in-memory catalog only — remove stale
    // warehouse dirs a previous test JVM left behind
    for (t <- Seq("graft_li_bucketed", "graft_ord_bucketed")) {
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(dir)
      }
    }
    li.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("graft_li_bucketed")
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_totalprice")
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graft_ord_bucketed")

    val joined = spark.table("graft_li_bucketed")
      .join(spark.table("graft_ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey").agg(sum("l_quantity"), max("o_totalprice"))
    val shuffles = joined.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.isEmpty,
      s"expected shuffle-free bucketed join, got:\n${joined.queryExecution.executedPlan}")
    assert(joined.count() > 0)
  }
}
