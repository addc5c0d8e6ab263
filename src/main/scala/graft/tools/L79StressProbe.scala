package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf100-class stress of the flagship LSH dedup chain (r12 verdict #6):
  * the full l79 pipeline (CW-minhash banding → candidate pruning →
  * bucket-local verify → connected components → keep-best) on a
  * ~5M-doc corpus, with SHUFFLE BYTES recorded alongside wall time so
  * the 100-TB posture ("band buckets move keys+ids, never documents")
  * is a measured number, not only a plan-shape argument.
  *
  * Corpus construction — and why it is NOT Amplify.documents at this
  * factor: Amplify's every-8th-char salting leaves replica twins of
  * one source doc at Jaccard ≈ 0.2 — below the 0.4 verify threshold
  * (so VERIFIED pairs scale linearly, the property the bench tiers
  * need), but band collisions fire at J^rowsPerBand per band, so
  * CANDIDATES grow quadratically in the replica count. At ×100 that
  * is the documented 24M-candidate bench workload; at ×1000 it is
  * ~100× that — a synthetic-data artifact (real corpora do not hold
  * 1000 mutually-0.2-Jaccard copies of every document; measured: the
  * ×1000 Amplify corpus shuffled >65 GB before filling the disk).
  * Here every (group, replica) gets its own salt character stream
  * injected every 4 chars — every 5-gram shingle carries salt, so
  * cross-group Jaccard ≈ 0 and the candidate set is driven by the
  * PLANTED structure: each replica's docs with source id ≡ 1 (mod 50)
  * are near-copies (same salt stream, small tail edit, J ≈ 0.9) of
  * their predecessor — 100 planted pairs × factor replicas = a 2%
  * dup rate, the realistic shape of a pre-dedup web corpus. The
  * expected output is exact: nDocs − plantedPairs canonical rows
  * (pair recall at J≈0.9 under 16×4 banding is 1 − 4e-8), so the run
  * doubles as a 5M-doc correctness check, not only a throughput one.
  *
  * Usage: runMain graft.tools.L79StressProbe [factor] [dupEvery] [storage]
  * (defaults 1000, 50, flat). The derived dir is cached in tmpdir;
  * derivation cost is printed separately and excluded from the
  * pipeline wall time.
  *
  * r14 (verdict #6) extras: `dupEvery` controls the planted duplicate
  * density (1-in-N source docs), and `storage=bucketed` stores the
  * stress corpus as a hive-persisted table bucketed by doc_id — the
  * at-rest layout under which minhashPairs' pass-2 survivor semi join
  * (Dedup.scala pass-1 comment) reads the corpus side with ZERO
  * exchange even when the surviving-id set outgrows the broadcast
  * threshold. Run flat-vs-bucketed at dupEvery=4 (survivors ≈ half
  * the corpus ≫ 10 MB, forcing the fallback) and compare shuffle
  * bytes: the delta is the 1× corpus-text shuffle the bucketed
  * layout removes.
  */
object L79StressProbe {
  def main(args: Array[String]): Unit = {
    val f = args.headOption.map(_.toInt).getOrElse(1000)
    val dupEvery = args.lift(1).map(_.toInt).getOrElse(50)
    val storage = args.lift(2).getOrElse("flat")
    require(storage == "flat" || storage == "bucketed",
      s"storage must be flat|bucketed, got $storage")
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val builder = SparkSession.builder().master("local[32]")
      // 5M docs → 80M banded keys; 128 partitions keeps each candidate
      // shuffle partition well inside executor memory (the same 4×-cores
      // sizing a 1000-executor job would use for a 100 TB corpus).
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("L79_PARTS", "128"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      // L79_NO_BCAST=1 disables size-based broadcasts (explicit
      // broadcast() hints are unaffected) so the pass-2 survivor semi
      // join takes its shuffle FALLBACK even when the surviving-id set
      // would broadcast — the regime a 100-TB corpus's duplicate
      // density puts it in. Used by the flat-vs-bucketed comparison:
      // same setting on both legs, the shuffle-byte delta is the 1×
      // corpus text the bucketed layout keeps at rest.
      .config("spark.ui.enabled", "false")
    val builder2 =
      if (sys.env.get("L79_NO_BCAST").contains("1"))
        builder.config("spark.sql.autoBroadcastJoinThreshold", "-1")
          .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      else builder
    val spark =
      (if (storage == "bucketed") graft.BucketedTables.configure(builder2)
       else builder2).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val keyOffset = Amplify.KeyOffset
    // per-(group, replica) salt stream, one char every 4 text chars —
    // every 5-gram shingle carries at least one salt char
    val saltUdf = udf((text: String, salt: Long) => {
      val s = java.lang.Long.toUnsignedString(
        salt * 0x9E3779B97F4A7C15L + 0x243F6A8885A308D3L, 36)
      val sb = new java.lang.StringBuilder(text.length + text.length / 4 + 1)
      var i = 0
      while (i < text.length) {
        sb.append(text.charAt(i))
        if (i % 4 == 3) sb.append(s.charAt((i / 4) % s.length))
        i += 1
      }
      sb.toString
    })

    val tag = new java.io.File(src).getAbsolutePath.replaceAll("[^A-Za-z0-9]", "_")
    val dupTag = if (dupEvery == 50) "" else s"_d$dupEvery"
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_stress_planted_v2_x$f$dupTag$tag.parquet") // v2: +is_dup column
    this.synchronized {
      if (!new java.io.File(dir, "_SUCCESS").exists()) {
        val t0 = System.nanoTime()
        val base = spark.read.parquet(s"$src/documents.parquet")
          .select("doc_id", "text")
        val prev = base.select((col("doc_id") + 1).as("doc_id"),
          col("text").as("prev_text"))
        val grouped = base.join(prev, Seq("doc_id"), "left")
          .withColumn("is_dup",
            col("doc_id") % dupEvery === 1 && col("prev_text").isNotNull)
          .withColumn("grp",
            when(col("is_dup"), col("doc_id") - 1).otherwise(col("doc_id")))
          .withColumn("base_text",
            when(col("is_dup"), concat(col("prev_text"), lit(" copyedit pass")))
              .otherwise(col("text")))
        val reps = spark.range(f).toDF("rep")
        grouped.repartition(32).crossJoin(broadcast(reps))
          .select(
            (col("doc_id") + col("rep") * keyOffset).as("doc_id"),
            saltUdf(col("base_text"), col("grp") + col("rep") * keyOffset)
              .as("text"),
            // persisted so the expected-count check below uses the SAME
            // predicate the derivation used (r13 advice: `doc_id % 50
            // == 1` alone over-counts when the predecessor id is absent
            // from the corpus — is_dup requires prev_text IS NOT NULL)
            col("is_dup"))
          .withColumn("n_chars", length(col("text")))
          .write.mode("overwrite").parquet(dir.getAbsolutePath)
        println(f"[l79stress] derived planted x$f$dupTag corpus in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
    }
    // At-rest bucketed twin (r14 verdict #6): one hive-persisted table
    // bucketed+sorted by doc_id, one file per bucket — the layout the
    // pass-1 comment in Dedup.minhashPairs names. Built once per
    // (factor, dupEvery); build cost is ingest-side, printed separately.
    // table name carries the source-dir tag like the flat cache dir
    // does (r14 review: without it a run against a different
    // SPARK_GRAFT_SF_DIR would silently reuse the previous source's
    // bucketed corpus and the flat-vs-bucketed legs would compare
    // different data)
    val bucketTable = s"stress_docs_x$f$dupTag$tag"
    if (storage == "bucketed") this.synchronized {
      if (!spark.catalog.tableExists(bucketTable)) {
        val t0 = System.nanoTime()
        spark.read.parquet(dir.getAbsolutePath)
          .repartition(128, col("doc_id"))
          .write.bucketBy(128, "doc_id").sortBy("doc_id")
          .mode("overwrite").saveAsTable(bucketTable)
        println(f"[l79stress] bucketed layout built in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
    }

    // task-level shuffle accounting (read + write + spill), the number
    // the plan-shape audit predicts: bytes proportional to (band, key,
    // id) triples plus ≥2-member-bucket payloads, NEVER corpus².
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    val spill = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          spill.addAndGet(m.diskBytesSpilled)
        }
      }
    })

    val docs =
      if (storage == "bucketed") spark.table(bucketTable)
      else spark.read.parquet(dir.getAbsolutePath)
    val nDocs = docs.count()
    val planted = docs.filter(col("is_dup")).count()
    val inputBytes = dir.listFiles().map(_.length()).sum
    val t0 = System.nanoTime()
    // minhashPairs, NOT minhashPairsExact: the exact twin exists for
    // cross-engine oracle parity and joins text payloads per candidate
    // pair; the production path verifies bucket-locally and (above the
    // 256 MB prune gate) moves only (band, key, id) triples before any
    // shingle array — the shape a 100 TB corpus needs.
    val pairs = graft.ops.Dedup.minhashPairs(docs, "doc_id", "text",
        shingleN = 5, numHashes = 64, bands = 16, threshold = 0.4)
      .select(col("id_a"), col("id_b"))
    val kept = graft.ops.Dedup.keepBest(docs,
      graft.ops.Dedup.connectedComponents(pairs), "doc_id", "n_chars")
    val n = kept.count()
    val secs = (System.nanoTime() - t0) / 1e9
    // drain async listener deliveries before reading the counters
    Thread.sleep(3000)
    println(f"[l79stress] x$f$dupTag/$storage ($nDocs docs, ${inputBytes / 1e6}%.0f MB parquet, " +
      f"$planted planted dups): $secs%.1f s, $n canonical rows " +
      f"(expected ${nDocs - planted}), " +
      f"shuffle_write=${shufWrite.get / 1e6}%.0f MB, " +
      f"shuffle_read=${shufRead.get / 1e6}%.0f MB, " +
      f"disk_spill=${spill.get / 1e6}%.0f MB, " +
      f"throughput=${nDocs / secs}%.0f docs/s")
    spark.stop()
  }
}
