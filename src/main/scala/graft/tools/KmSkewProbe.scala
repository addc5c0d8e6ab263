package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** r10 verdict #2 evidence: SemDeDup's hot-cluster triangle split on a
  * DELIBERATELY skewed corpus — one cluster holding ≥20% of all
  * vectors (the boilerplate-collapse failure mode). Drives semDedup
  * with the split effectively OFF (cap ≥ cluster size → one quadratic
  * task) vs ON (default 8192 cap), reporting wall time, the MAX single
  * task duration (the straggler the split exists to bound), and an
  * output-equality check.
  *
  * Skew construction: args = [nVecs] (default 200000). 25% of vectors
  * share one direction family (tiny per-id jitter in a late dim, so
  * they quantize into ONE k-means cluster but are not all exact dups);
  * the rest spread over distinct directions.
  */
object KmSkewProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val maxTaskMs = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val d = te.taskInfo.duration
        var cur = maxTaskMs.get()
        while (d > cur && !maxTaskMs.compareAndSet(cur, d)) cur = maxTaskMs.get()
      }
    })
    // hot family: dims (1, eps·id mod small); cold: distinct rotations
    val emb = spark.range(n).select(
      col("id").as("vec_id"),
      when(pmod(col("id"), lit(4L)) === 0, // 25% hot
        array((0 until 16).map {
          case 0 => lit(1.0f)
          case 15 => (pmod(col("id"), lit(97L)).cast("float") / 9700.0f)
          case _ => lit(0.0f)
        }: _*))
      .otherwise(
        array((0 until 16).map { i =>
          (when(pmod(col("id"), lit(13L)) === (i % 13), lit(1.0f))
            .otherwise(lit(0.0f))
            + pmod(col("id") * (i + 7), lit(101L)).cast("float") / 101.0f)
        }: _*)).as("embedding"))
      .localCheckpoint()
    println(s"[kmskew] n=$n hot=${emb.count() / 4}")
    def drive(label: String, cap: String): Map[Boolean, Long] = {
      spark.conf.set("spark.graft.semdedup.cluster.cap", cap)
      maxTaskMs.set(0)
      val t0 = System.nanoTime()
      val out = graft.ops.Clustering.semDedup(
          emb, "vec_id", "embedding", k = 64, iters = 1, tau = 0.999)
        .groupBy("is_dup").count()
        .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async — give the bus a moment to drain
      Thread.sleep(500)
      println(f"[kmskew] $label: wall $wall%.1f s, max task ${maxTaskMs.get() / 1000.0}%.1f s, dups ${out.getOrElse(true, 0L)}")
      out
    }
    val split = drive("split ON  (cap 8192)", "8192")
    drive("split ON  (cap 4096)", "4096")
    drive("split ON  (cap 2048)", "2048")
    val mono = drive("split OFF (cap 1 << 30)", (1 << 30).toString)
    assert(split == mono, s"split changed output: $split vs $mono")
    println("[kmskew] outputs identical")
    spark.stop()
  }
}
