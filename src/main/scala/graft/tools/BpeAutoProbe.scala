package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures trainMergesAuto at realistic merge counts on the amplified
  * corpus — the gate's payoff in numbers for SCALE.md. */
object BpeAutoProbe {
  def main(args: Array[String]): Unit = {
    val path = args.lift(0).getOrElse("/tmp/graft_curateprobe_x100.parquet")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(path)
    println(s"[probe] docs=${docs.count()}")
    for (m <- Seq(100, 1000, 5000)) {
      val t0 = System.nanoTime()
      val merges = graft.ops.BpeTrainer.trainMergesAuto(docs, "text", m)
      println(f"[probe] merges=$m%5d got=${merges.length}%5d " +
        f"auto_s=${(System.nanoTime() - t0) / 1e9}%8.2f")
    }
    spark.stop()
  }
}
