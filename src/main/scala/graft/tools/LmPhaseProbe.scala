package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver-phase decomposition of the y07 serving path (r15): the
  * QueryStatsProbe showed y07's wall at ~5 s with only ~34 task-sec of
  * executor work — the rest is driver-side (model collects, hash-map
  * build, broadcast ship) plus job cadence. This probe times each
  * phase of scoreAuto's kernel path explicitly so the optimization
  * targets the measured half. SCALE.md records the numbers.
  */
object LmPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val f = args.lift(1).map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[lmphase] $tag%-14s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_curateprobe_x$f.parquet")
    require(dir.exists(), s"run LmProbe first to derive $dir")
    val docs = spark.read.parquet(dir.getAbsolutePath)
    val ref = graft.ops.Sampling.hashSample(docs, "text", 0.5)
    (1 to 2).foreach { cycle =>
      println(s"[lmphase] --- cycle $cycle ---")
      val model = time("train+cache") {
        graft.ops.LmScore.trainStupidBackoff(ref, "text").cache()
      }
      val gate = time("gate-counts") {
        model.uni.count() + model.bigModel.count()
      }
      val uniRows = time("collect-uni") { model.uni.collect() }
      val bigRows = time("collect-big") { model.bigModel.collect() }
      println(s"[lmphase] sizes uni=${uniRows.length} big=${bigRows.length} gate=$gate")
      val uniMap = time("build-uni") {
        val m = new java.util.HashMap[String, java.lang.Long](uniRows.length * 2)
        uniRows.foreach(r => m.put(r.getString(0), r.getLong(1)))
        m
      }
      val big2 = time("build-big") {
        val m = new java.util.HashMap[String, java.util.HashMap[String, Array[Long]]]()
        bigRows.foreach { r =>
          m.computeIfAbsent(r.getString(0),
            _ => new java.util.HashMap[String, Array[Long]]())
            .put(r.getString(1), Array(r.getLong(2), r.getLong(3)))
        }
        m
      }
      val bc = time("broadcast") {
        spark.sparkContext.broadcast((uniMap, big2))
      }
      time("score-job") {
        graft.ops.LmScore.scoreWithBroadcastModel(
            docs, model, "doc_id", "text")
          .write.format("noop").mode("overwrite").save()
      }
      bc.destroy()
    }
    spark.stop()
  }
}
