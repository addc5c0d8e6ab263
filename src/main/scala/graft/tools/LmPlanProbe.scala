package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level breakdown of the LM scoring plan at the probe corpus:
  * times each sub-plan (transition explode, model build, scoring
  * joins, final aggregate) separately and prints the formatted plan
  * of the full op, so SCALE.md perf claims point at measured stages.
  */
object LmPlanProbe {
  def main(args: Array[String]): Unit = {
    val f = args.lift(0).getOrElse("100").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(
      new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_curateprobe_x$f.parquet").getAbsolutePath)
    val ref = graft.ops.Sampling.hashSample(docs, "text", 0.5)
    def time(tag: String)(x: => Any): Unit = {
      val t0 = System.nanoTime()
      x
      println(f"PROBE $tag%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    import graft.ops.LmScore
    val full = LmScore.scoreStupidBackoff(docs, ref, "doc_id", "text")
    // component timings
    val toks = filter(split(lower(col("text")), graft.kernel.TextKernel.WsPlus),
      t => t =!= "")
    time("tokenize+count") {
      docs.select(sum(size(toks))).collect()
    }
    val n1 = greatest(size(toks) - 1, lit(0))
    val tr = docs.select(col("doc_id"), explode(arrays_zip(
      slice(toks, lit(1), n1).as("prev"),
      slice(toks, lit(2), n1).as("w"))).as("tr"))
    time("trans explode (native)") { tr.select(count(lit(1))).collect() }
    time("uni agg") {
      ref.select(explode(toks).as("w")).groupBy("w")
        .agg(count(lit(1))).select(count(lit(1))).collect()
    }
    time("full score") {
      full.write.format("noop").mode("overwrite").save()
    }
    full.explain("formatted")
    spark.stop()
  }
}
