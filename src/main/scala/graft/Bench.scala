package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times the curated bench subset (QueryDef.bench) on
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Evaluation uses the
  * noop sink so every operator in the plan is fully executed — a bare
  * .count() lets Catalyst prune the very projections/windows under
  * test (round-1 verdict, What's wrong #2). Failures are reported as
  * an explicit errors map, never as fake timings.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Contention audit (r8 verdict #2: x10 swung ±80% on an overlapped
    // probe JVM): record every OTHER live JVM at bench start, so a
    // noisy number in the round's record is self-explaining.
    val ambientJvms: Seq[String] = {
      import scala.jdk.CollectionConverters._
      val self = ProcessHandle.current().pid()
      ProcessHandle.allProcesses().iterator().asScala
        .filter(p => p.pid() != self &&
          p.info().command().map[Boolean](_.contains("java")).orElse(false))
        .map(p => p.info().commandLine().orElse(p.info().command().orElse(""))
          .take(120))
        .toSeq
    }
    // The bucketed-at-rest section needs two static session settings
    // (hive catalog + bucketed-scan ordering, see BucketedTables);
    // env-gated OFF only as an escape hatch.
    val bucketedOn = sys.env.getOrElse("SPARK_GRAFT_BUCKETED", "true") != "false"
    val builder0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Equi-joins at this scale fit hash tables comfortably; shuffled
      // hash join skips the per-side sorts of SMJ (measured: self-join
      // 1.13s → 0.80s). AQE still falls back to SMJ when a build side
      // is too large, so this is safe at bigger SFs too.
      .config("spark.sql.join.preferSortMergeJoin", "false")
      // Override hook for A/B runs (default = Spark's default, AQE on).
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      // local[32] shuffles never cross a network: lz4-compressing spill
      // files only burns CPU here (measured ~7% off the suite). On a
      // real cluster this stays default-on — it trades CPU for NIC.
      // Env-overridable because the tradeoff inverts when the shuffle
      // working set outgrows the page cache / free disk (the derived
      // sf100 drive: a 600M-row exchange is ~30 GB raw, ~4x less lz4'd
      // — there compression trades CPU for disk, same as for NIC).
      .config("spark.shuffle.compress",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_COMPRESS", "false"))
      .config("spark.shuffle.spill.compress",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_COMPRESS", "false"))
      .config("spark.ui.enabled", "false")
    val spark =
      (if (bucketedOn) BucketedTables.configure(builder0) else builder0)
        .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.FramelessWindowStrategy.install(spark)

    val layerA = SparkEntry.benchQueries
    // Round-6 widening: the heavy domain/LLM set (LSH, connected
    // components, repetition kernels, semantic dedup, aligner/rype
    // throughput) is timed too — that is where this engine's value is;
    // the Layer-A 7 remain the DuckDB-baseline-comparable subset and
    // their sum is reported separately (layer_a_total) so the
    // round-over-round and BASELINE.md comparisons stay apples-to-
    // apples. Heavy queries run best-of-2 (they are multi-second;
    // run-to-run variance is proportionally small) to bound bench
    // wall-time.
    val heavy = SparkEntry.benchHeavyQueries
    // Warm-up: run the full suite once untimed so the timed pass
    // measures steady-state execution (JIT-compiled codegen, warm
    // parquet footers / broadcast relations), not JVM startup.
    (layerA ++ heavy).foreach { q =>
      try q.impl(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      // let the ContextCleaner release the previous query's shuffle
      // files promptly — at the derived sf100 the warmup pass otherwise
      // accumulates several finished queries' exchanges on disk at once
      System.gc()
    }

    // Best-of-N timed passes: steady-state minimum, robust to GC /
    // scheduler noise on a shared box.
    var times = Vector.empty[(String, Double)]
    var errors = Vector.empty[(String, String)]
    def timeSet(defs: Seq[QueryDef], reps: Int): Unit = defs.foreach { q =>
      try {
        // GC between queries: without this, garbage from the previous
        // query's shuffle/window buffers lands as a major collection
        // inside the NEXT query's timed runs (observed: a01 0.19s →
        // 4.2s when timed right after the warm-up pass at sf10).
        System.gc()
        def once(): Double = {
          val t0 = System.nanoTime()
          q.impl(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        val runs = (1 to reps).map(_ => once())
        // Sub-0.3 s queries: a single GC pause is a ±30% swing that
        // best-of-3 doesn't reliably absorb (r7: a01 +34% on noise
        // while everything real improved). Two extra runs cost <1 s
        // and keep round-over-round deltas signal.
        var widened =
          if (runs.min < 0.3) runs ++ (1 to 2).map(_ => once()) else runs
        // Heavy entries that disagree with themselves >25% were hit by
        // ambient load mid-sample (r8: x10 3.8→6.9 s on an overlapped
        // probe JVM) — one more run costs seconds and keeps the
        // round-over-round record readable.
        if (widened.max > widened.min * 1.25) widened :+= once()
        times :+= (q.name -> widened.min)
      } catch {
        case e: Throwable =>
          errors :+= (q.name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }
    }
    timeSet(layerA, reps = 3)
    timeSet(heavy, reps = 2)
    // Bucketed-at-rest quartet (standing path, r8 verdict #1): layout
    // build is ingest-side cost reported separately; the quartet times
    // land in `queries` (k06/k08/k16/k19) and sum to bucketed_total.
    val bucketed = if (bucketedOn) BucketedTables.queries else Seq.empty
    val bucketedBuild =
      if (bucketedOn)
        try BucketedTables.ensure(spark, sfDir)
        catch { case e: Throwable =>
          errors :+= ("bucketed_build" ->
            Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
          -1.0
        }
      else -1.0
    if (bucketedBuild >= 0.0) {
      bucketed.foreach { q =>
        try q.impl(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
        System.gc()
      }
      timeSet(bucketed, reps = 3)
    }
    def jq(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = times.map { case (k, v) => s"${jq(k)}:$v" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jq(k)}:${jq(v)}" }.mkString("{", ",", "}")
    val layerANames = layerA.map(_.name).toSet
    val bucketedNames = bucketed.map(_.name).toSet
    val layerATotal = times.collect { case (k, v) if layerANames(k) => v }.sum
    val bucketedTotal = times.collect { case (k, v) if bucketedNames(k) => v }.sum
    val heavyTotal = times.collect {
      case (k, v) if !layerANames(k) && !bucketedNames(k) => v }.sum
    val total = times.map(_._2).sum
    val aj = ambientJvms.map(jq).mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","layer_a_total":$layerATotal,"heavy_total":$heavyTotal,"bucketed_total":$bucketedTotal,"bucketed_build_sec":$bucketedBuild,"ambient_jvms":$aj,"queries":$qs,"errors":$es,"sf":${jq(sfDir)}}""")
    spark.stop()
  }
}
