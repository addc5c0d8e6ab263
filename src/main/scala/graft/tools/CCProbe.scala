package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (VERDICT r5 Next #5): connected components on long
  * chain graphs — the worst case for label propagation (diameter =
  * node count) and the shape that previously triggered the
  * exponential-Catalyst-statistics driver stall past ~13 iterations.
  * Verifies convergence, the single-component answer, and wall time at
  * 50k and 1M nodes. Not part of the driver contract.
  */
object CCProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (nodes <- Seq(50000L, 1000000L)) {
      val pairs = spark.range(nodes - 1)
        .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
      val t0 = System.nanoTime()
      // localMaxEdges=0 forces the distributed loop — the thing under test
      val cc = graft.ops.Dedup.connectedComponents(pairs, maxIters = 30, localMaxEdges = 0)
      val comps = cc.agg(
        countDistinct(col("component")).as("n_comp"),
        count(lit(1)).as("n")).collect()(0)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"PROBE cc_chain nodes=$nodes components=${comps.getLong(0)} " +
        f"rows=${comps.getLong(1)} wall=$secs%.1fs")
      require(comps.getLong(0) == 1L, "chain must collapse to one component")
      require(comps.getLong(1) == nodes, "every node labeled")
      cc.unpersist()
    }
    spark.stop()
  }
}
