package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for GraphRank.pageRank: synthetic power-law-ish graphs
  * at two decades, wall time per size, so SCALE.md records a measured
  * scaling slope for the one-shuffle-per-iteration claim.
  *
  * Usage: runMain graft.tools.GraphProbe [nodes,nodes,...] [iters]
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sizes = args.lift(0).getOrElse("500000,5000000").split(",").map(_.toLong)
    val iters = args.lift(1).getOrElse("5").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- sizes) {
      // 3 out-edges per node: two modular strides plus a hub edge to a
      // small id (id % 1024) — gives the graph a skewed in-degree head
      // like real web graphs, exercising the dst-side aggregate skew.
      val ids = spark.range(0, n).select(col("id").as("src"))
      val edges = ids.select(col("src"), ((col("src") * 37 + 11) % n).as("dst"))
        .union(ids.select(col("src"), ((col("src") * 53 + 7) % n).as("dst")))
        .union(ids.select(col("src"), (col("src") % 1024).as("dst")))
      val t0 = System.nanoTime()
      val ranks = graft.ops.GraphRank.pageRank(edges, iters)
      val top = ranks.orderBy(col("rank").desc).limit(3).collect()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[probe] n=$n%9d edges=${3 * n}%9d iters=$iters " +
        f"pagerank ${secs}%8.2f s top=${top.map(r => s"${r.get(0)}:${f"${r.getDouble(1)}%.2e"}").mkString(",")}")
    }
    spark.stop()
  }
}
