package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for GraphRank: synthetic power-law-ish graphs across
  * decades, wall time per size, so SCALE.md records a measured scaling
  * slope for the one-shuffle-per-iteration claim. Covers all three
  * production variants (r8 verdict #7 + #3 evidence):
  *   - pr:   pageRank, no dangling nodes (the x11 shape);
  *   - ppr:  personalizedPageRank, 1% seed set (the is_seed column
  *           rides every checkpoint — confirms the decade behavior
  *           matches plain pageRank);
  *   - dang: pageRank on a dangling-heavy variant (nodes ≡ 0 mod 10
  *           keep NO out-edges → 10% dangling) — exercises the static
  *           precomputed dangling set (one anti-join up front, per-
  *           iteration semi-join of the n-row rank table only).
  * `tol` > 0 reports iterations actually run under the convergence
  * stop alongside wall time.
  *
  * Usage: runMain graft.tools.GraphProbe [nodes,...] [iters] [modes] [tol]
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sizes = args.lift(0).getOrElse("500000,5000000").split(",").map(_.toLong)
    val iters = args.lift(1).getOrElse("5").toInt
    val modes = args.lift(2).getOrElse("pr,ppr,dang").split(",").toSeq
    val tol = args.lift(3).map(_.toDouble).getOrElse(0.0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- sizes; mode <- modes) {
      // 3 out-edges per node: two modular strides plus a hub edge to a
      // small id (id % 1024) — gives the graph a skewed in-degree head
      // like real web graphs, exercising the dst-side aggregate skew.
      val ids = spark.range(0, n).select(col("id").as("src"))
      val all = ids.select(col("src"), ((col("src") * 37 + 11) % n).as("dst"))
        .union(ids.select(col("src"), ((col("src") * 53 + 7) % n).as("dst")))
        .union(ids.select(col("src"), (col("src") % 1024).as("dst")))
      val edges =
        if (mode == "dang") all.filter(col("src") % 10 =!= 0) else all
      val t0 = System.nanoTime()
      val (ranks, ran) = mode match {
        case "ppr" =>
          graft.ops.GraphRank.personalizedPageRankWithStats(edges,
            spark.range(0, n, 100).select(col("id")), iters, relTol = tol)
        case "hits" =>
          (graft.ops.GraphRank.hits(edges, iters)
            .select(col("id"), col("auth").as("rank")), iters)
        case _ =>
          graft.ops.GraphRank.pageRankWithStats(edges, iters, relTol = tol)
      }
      val top = ranks.orderBy(col("rank").desc).limit(3).collect()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[probe] n=$n%9d mode=$mode%-4s iters=$ran/$iters " +
        f"${secs}%8.2f s top=${top.map(r =>
          s"${r.get(0)}:${f"${r.getDouble(1)}%.2e"}").mkString(",")}")
    }
    spark.stop()
  }
}
