package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Lineage.TruncateOps

/** One-iteration plan dump for the PageRank loop: shows whether the
  * checkpointed edgesW/ranks co-partition the contributions join or
  * Catalyst inserts exchanges despite the pinned repartition.
  */
object GraphPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 100000L
    val ids = spark.range(0, n).select(col("id").as("src"))
    val edges = ids.select(col("src"), ((col("src") * 37 + 11) % n).as("dst"))
      .union(ids.select(col("src"), ((col("src") * 53 + 7) % n).as("dst")))
    val e = edges.select(col("src"), col("dst")).distinct()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("odeg"))
    val edgesW = e.join(outdeg, Seq("src"))
      .repartition(32, col("src")).persist()
    val nodes = edgesW.select(col("src").as("id"))
      .union(edgesW.select(col("dst").as("id")))
      .distinct().repartition(32, col("id")).persist()
    val ranks = nodes.select(col("id"), lit(1.0 / n).as("rank"))
      .truncateLineage()
    println("=== edgesW rdd partitioner: " + edgesW.rdd.partitions.length)
    println("=== edgesW physical: " +
      edgesW.queryExecution.executedPlan.outputPartitioning)
    println("=== ranks physical: " +
      ranks.queryExecution.executedPlan.outputPartitioning)
    val inflow = edgesW
      .join(ranks, edgesW("src") === ranks("id"))
      .select(col("dst").as("id"), (col("rank") / col("odeg")).as("c"))
      .groupBy(col("id")).agg(sum(col("c")).as("inflow"))
    val next = nodes.join(inflow, Seq("id"), "left")
      .select(col("id"), coalesce(col("inflow"), lit(0.0d)).as("rank"))
    next.write.format("noop").mode("overwrite").save()
    println(next.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
