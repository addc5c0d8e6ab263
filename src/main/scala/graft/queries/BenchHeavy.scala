package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Bench-only throughput workloads for the DOMAIN operators, sized by
  * the scale-factor tables so they grow with the SF dir like the
  * Layer-A bench queries do. They are deliberately NOT registered in
  * SparkEntry.allQueryDefs: they exist to measure throughput, not to
  * re-prove correctness — the operators under test carry their own
  * oracle rows (aligner: b22/b30/b31; rype: b20/b21/b32) and reference
  * goldens.
  *
  * Workload shape: deterministic synthetic genomes (LayerB's LCG, the
  * same generator the correctness fixtures use), one 150 bp read per
  * `documents` row sliced at an id-derived offset — so at sf0.1 the
  * aligner sees 5 000 reads, at the ScaleUp-derived sf1/sf10 dirs
  * 50 000 / 500 000, with alignment positions spread over the genome.
  */
object BenchHeavy {
  private val NGenomes = 4
  private val GenomeLen = 2000
  private val ReadLen = 150
  /** Bench-time corpus amplification for x03/x04 (see the QueryDef
    * comments) is ADAPTIVE: amplify up to a minimum corpus size, never
    * beyond. At the driver's sf0.1 (5 000 docs / 2 000 vectors) that
    * reproduces the fixed ×10/×25 of round 7's first cut — large
    * enough that the operator, not the ~0.2 s/stage local scheduling
    * floor, dominates; at an already-large derived dir (sf10's 500k
    * docs, sf100's 5M) the factor is 1 and the suite measures the dir
    * as-is — a fixed ×10 on a 5M-doc corpus would have pushed x03's
    * designed O(corpus × bands) shuffle past the disk, benchmarking
    * the hardware instead of the operator. */
  private val DocTarget = 50000L
  private val EmbTarget = 50000L
  /** x19's WARC payload template, shared between the payload
    * expression AND the fixture-version hash (r13 advice: a
    * hand-maintained placeholder copy of the template reproduces the
    * stale-fixture bug the hash exists to prevent). */
  private[graft] val X19PayloadPrefix =
    "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html><body><h1>Doc "
  private[graft] val X19PayloadMid = "</h1><p>"
  private[graft] val X19PayloadSuffix = "</p></body></html>"
  /** Catalog-safe per-data-dir tag for the bucketed BM25 index tables
    * (hive lowercases table names — bake that in so File checks and
    * catalog lookups agree).
    */
  private def bm25TableTag(d: String): String =
    new java.io.File(d).getAbsolutePath
      .replaceAll("[^A-Za-z0-9]", "_").toLowerCase

  private def factorFor(s: org.apache.spark.sql.SparkSession, d: String,
      table: String, target: Long): Int = {
    // parquet row count is footer metadata — no data scan
    val n = math.max(1L, s.read.parquet(s"$d/$table.parquet").count())
    math.max(1L, (target + n - 1) / n).toInt
  }

  /** Derive an amplified copy of `table` ONCE per (sf dir, factor)
    * into a bench-scoped temp parquet and return its path. Iterative
    * operators (Lloyd's training, multi-stage LSH) re-scan their
    * corpus across many jobs; deriving in-plan would re-run the
    * crossJoin amplification per job and charge the bench for
    * synthetic data generation instead of the operator. The
    * derivation is deterministic, so an existing dir is reused —
    * including across bench processes in the same round.
    */
  private def amplifiedDir(
      s: org.apache.spark.sql.SparkSession, d: String, table: String, n: Int)(
      derive: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): String = {
    val tag = new java.io.File(d).getAbsolutePath.replaceAll("[^A-Za-z0-9]", "_")
    val out = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_bench_${table}_x${n}$tag.parquet")
    this.synchronized {
      if (!out.exists())
        derive(s.read.parquet(s"$d/$table.parquet"))
          .repartition(s.sparkContext.defaultParallelism)
          .write.mode("overwrite").parquet(out.getAbsolutePath)
    }
    out.getAbsolutePath
  }

  /** Derive-once cache for bench-scoped artifacts that production
    * would persist (e.g. the x08 minhash index): same reuse contract
    * as [[amplifiedDir]] but for an arbitrary derived DataFrame.
    */
  private def cachedDir(d: String, name: String)(
      derive: => org.apache.spark.sql.DataFrame): String = {
    val tag = new java.io.File(d).getAbsolutePath.replaceAll("[^A-Za-z0-9]", "_")
    val out = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_bench_$name$tag.parquet")
    this.synchronized {
      if (!out.exists())
        derive.write.mode("overwrite").parquet(out.getAbsolutePath)
    }
    out.getAbsolutePath
  }

  /** [[cachedDir]] with a hive-style PARTITIONED layout — the at-rest
    * shape partition-pruned serving (x16) reads back.
    */
  private def cachedPartitionedDir(d: String, name: String, partCol: String)(
      derive: => org.apache.spark.sql.DataFrame): String = {
    val tag = new java.io.File(d).getAbsolutePath.replaceAll("[^A-Za-z0-9]", "_")
    val out = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_bench_$name$tag.parquet")
    this.synchronized {
      if (!out.exists())
        derive.write.mode("overwrite").partitionBy(partCol)
          .parquet(out.getAbsolutePath)
    }
    out.getAbsolutePath
  }

  /** doc_id → deterministic read (genome id*131-strided offset). */
  private def readsFrom(docs: org.apache.spark.sql.DataFrame) = {
    val genomes = LayerB.syntheticGenomes(NGenomes, GenomeLen)
    val slice = udf((id: Long) => {
      val g = genomes(java.lang.Math.floorMod(id, NGenomes.toLong).toInt)
      val off = java.lang.Math.floorMod(id * 131, (GenomeLen - ReadLen).toLong).toInt
      g.substring(off, off + ReadLen)
    })
    // The sf parquet files are single-row-group (SCALE.md "Local-mode
    // honesty"), so without this the whole alignment runs in ONE task
    // (measured: ~8 ms/read × 5000 reads serial). Real read sets
    // arrive in many partitions; give the map-only aligner the
    // session's parallelism. The shuffled rows are (id, 150 bp) —
    // negligible next to the alignment work.
    docs.select(concat(lit("r"), col("doc_id")).as("read_id"),
      slice(col("doc_id")).as("sequence1"))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
  }

  val queries: Seq[QueryDef] = Seq(
    // minimap2-style alignment throughput: |documents| reads vs 4
    // subjects — index build (driver, subjects must fit in RAM per the
    // reference's own bind-time contract) + map-only seed-and-extend
    // over the read partitions.
    QueryDef(
      "x01_align_throughput",
      (s, d) => {
        import s.implicits._
        val subjects = LayerB.syntheticGenomes(NGenomes, GenomeLen).zipWithIndex
          .map { case (g, i) => (s"ref$i", g) }.toDF("read_id", "sequence1")
        graft.ops.AlignOps.alignMinimap2(readsFrom(Tables.documents(s, d)),
          subjects, k = 16, w = 5)
      }),

    // rype classification throughput: same read set against a 4-bucket
    // minimizer index — explode + hash join on minimizer.
    QueryDef(
      "x02_rype_throughput",
      (s, d) => {
        import s.implicits._
        val subjects = LayerB.syntheticGenomes(NGenomes, GenomeLen).zipWithIndex
          .map { case (g, i) => (s"bucket$i", g) }.toDF("bucket_name", "sequence1")
        val index = graft.ops.RypeOps.buildIndex(subjects, k = 16, w = 5)
        graft.ops.RypeOps.rypeClassify(index, readsFrom(Tables.documents(s, d)),
          k = 16, w = 5, threshold = 0.2)
      }),

    // Production MinHash+LSH pipeline (kernel signatures, payload-free
    // band join, kernel Jaccard verify) — the l03 registration is the
    // md5-derived oracle twin and deliberately interpreted, so the
    // throughput of the real operator is measured here. The corpus is
    // amplified adaptively (×10 at the driver's sf0.1; ×1 at large
    // derived dirs) via disjoint salted replicas (tools/Amplify —
    // the ScaleUp derivation without the disk round-trip): at the
    // driver's sf0.1 that is 50k docs, enough that the operator
    // dominates the ~0.2 s/stage local scheduling floor instead of
    // drowning in it (VERDICT r6, What's wrong #3). Repartitioned for
    // the same single-row-group reason as readsFrom.
    QueryDef(
      "x03_minhash",
      (s, d) => {
        val f = factorFor(s, d, "documents", DocTarget)
        val docs =
          if (f <= 1) Tables.documents(s, d)
            .repartition(s.sparkContext.defaultParallelism)
          else s.read.parquet(amplifiedDir(s, d, "documents", f)(
            graft.tools.Amplify.documents(_, f)))
        graft.ops.Dedup.minhashPairs(docs, "doc_id", "text",
          shingleN = 5, numHashes = 64, bands = 16, threshold = 0.4)
      }),

    // IVF ANN throughput: train the coarse quantizer (one distributed
    // Lloyd's refinement — production pipelines train once and serve
    // many queries, so the bench weights serving), assign the whole
    // corpus, probe 8/64 lists for 200 queries — the production
    // partial-probe path (l11's registration is the full-probe oracle
    // configuration). Exercises the broadcast-centroid assignment
    // kernel and the O(k)-state top_k_by aggregate at corpus scale.
    // The corpus is amplified adaptively (×25 at the driver's sf0.1;
    // ×1 at large derived dirs; rotation-disjoint replicas)
    // for the same stage-floor reason: 2 000 raw vectors at sf0.1 made
    // x04 measure Spark job overhead — wall-time was INVERTED in
    // corpus size (8.0 s on 2k vectors vs 5.8 s on 200k at sf10).
    // 50k+ vectors put the assignment kernel back in charge, so the
    // number moves with the operator.
    QueryDef(
      "x04_ivf_ann",
      (s, d) => {
        val f = factorFor(s, d, "embeddings", EmbTarget)
        val emb =
          if (f <= 1) Tables.embeddings(s, d)
            .repartition(s.sparkContext.defaultParallelism)
          else s.read.parquet(amplifiedDir(s, d, "embeddings", f)(
            graft.tools.Amplify.embeddings(_, f)))
        // query side from the raw table: the 200-row filter pushes to
        // the parquet scan instead of riding the corpus amplification
        val queries = Tables.embeddings(s, d).filter(col("vec_id") < 200)
        graft.ops.Similarity.ivfTopK(emb, queries,
          dim = 64, k = 10, nLists = 64, nProbe = 8, iters = 1)
      }),

    // IVF SERVING from the at-rest artifact split (r9 verdict #5 —
    // x04's standing-deployment half): the 50k assignment persisted
    // ONCE partitioned by list_id + the tiny centroid model, then a
    // 16-query batch served with driver-resolved probes folded into a
    // partition-pruning literal — the batch reads ONLY its probed
    // lists' directories (≤ union-of-probes of 64), never the corpus.
    // x04 measures train+assign+serve; this row measures what a
    // standing deployment actually pays per batch.
    QueryDef(
      "x16_ivf_serve_partitioned",
      (s, d) => {
        val f = factorFor(s, d, "embeddings", EmbTarget)
        def emb = s.read.parquet(
          if (f <= 1) s"$d/embeddings.parquet"
          else amplifiedDir(s, d, "embeddings", f)(
            graft.tools.Amplify.embeddings(_, f)))
        val centsPath = cachedDir(d, s"ivfcents_x$f")({
          val cents = graft.ops.Similarity.ivfCentroids(
            emb, dim = 64, nLists = 64, iters = 1)
          import s.implicits._
          cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
            .toDF("list_id", "c").repartition(1)
        })
        val cents = graft.ops.Similarity.loadIvfModel(s, centsPath)
        val idxPath = cachedPartitionedDir(d, s"ivfidx_x$f", "list_id")(
          graft.ops.Similarity.ivfAssignWithModel(emb, cents))
        val queries = Tables.embeddings(s, d).filter(col("vec_id") < 16)
        graft.ops.Similarity.ivfTopKFromPartitionedIndex(
          s, idxPath, cents, queries, k = 10, nProbe = 8)
      }),

    // Winnowing similarity pairs at 50k docs (the l81 family's
    // throughput row): the fingerprint pass is the map-side cost (one
    // md5 per k-gram per doc), the exchange carries (doc_id, fp) keys
    // only, and the 2 ≤ df ≤ maxDf prune bounds every pair bucket —
    // the family's whole scale claim as one wall number. Amplified
    // replicas are 8-char-salted, so cross-replica grams diverge and
    // the pair structure stays per-replica (no synthetic quadratics).
    QueryDef(
      "x17_winnow_pairs",
      (s, d) => {
        val f = factorFor(s, d, "documents", DocTarget)
        val docs =
          if (f <= 1) Tables.documents(s, d)
            .repartition(s.sparkContext.defaultParallelism)
          else s.read.parquet(amplifiedDir(s, d, "documents", f)(
            graft.tools.Amplify.documents(_, f)))
        // FNV production hash (r11): the md5-oracle/FNV-production
        // split every other dedup family has — l81 stays the
        // md5-exact oracle twin; the 6053-pair md5 cross-engine check
        // of HEAVY_BASELINE reproduces with exactHash = true.
        graft.ops.Dedup.winnowSimilarityPairs(docs, "doc_id", "text",
            k = 8, w = 4, minShared = 2, maxDf = 8, exactHash = false)
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("n_shared")).as("total_shared"))
      }),

    // Line-level dedup throughput over the amplified corpus (same
    // cached ×-factor dir as x03): five synthesized lines per doc —
    // shared headers/footers at high df, an md5-unique line, a paired
    // mid line — through the production explode → df agg → anti-join
    // → order-preserving reassembly pipeline. l32 is the correctness
    // twin at sf0.01.
    QueryDef(
      "x05_line_dedup",
      (s, d) => {
        val f = factorFor(s, d, "documents", DocTarget)
        val docs =
          if (f <= 1) Tables.documents(s, d)
            .repartition(s.sparkContext.defaultParallelism)
          else s.read.parquet(amplifiedDir(s, d, "documents", f)(
            graft.tools.Amplify.documents(_, f)))
        val multi = docs.select(col("doc_id"),
          concat(
            lit("header "), col("doc_id") % 7,
            lit("\nuniq "), md5(col("doc_id").cast("string")),
            lit("\n\nmid "), col("doc_id") % 250,
            lit("\nfooter "), col("doc_id") % 3).as("text"))
        graft.ops.CorpusStats.dedupLines(multi, "doc_id", "text", minDocs = 3)
      }),

    // Duplicated-span fraction over the amplified corpus' REAL text:
    // tokenize, chunk, fingerprint-df, flag join — the Lee-et-al
    // signal at 50k+ docs. l36 is the correctness twin.
    QueryDef(
      "x06_dup_spans",
      (s, d) => {
        val f = factorFor(s, d, "documents", DocTarget)
        val docs =
          if (f <= 1) Tables.documents(s, d)
            .repartition(s.sparkContext.defaultParallelism)
          else s.read.parquet(amplifiedDir(s, d, "documents", f)(
            graft.tools.Amplify.documents(_, f)))
        graft.ops.CorpusStats.dupChunkFraction(docs, "doc_id", "text",
          chunkTokens = 5, minDocs = 2, exactHash = false)
      }),

    // Stupid-Backoff LM scoring over the amplified corpus (same cached
    // ×-factor dir): train the bigram model on the md5-even half,
    // CACHE the model tables (model-sized, so the scoring joins see
    // real sizes and AQE broadcasts them — scoring then runs map-only;
    // the uncached one-shot path re-derives the model subtree per
    // join, SCALE.md), score everything. l38 is the correctness twin.
    QueryDef(
      "x07_lm_score",
      (s, d) => {
        val f = factorFor(s, d, "documents", DocTarget)
        val docs =
          if (f <= 1) Tables.documents(s, d)
            .repartition(s.sparkContext.defaultParallelism)
          else s.read.parquet(amplifiedDir(s, d, "documents", f)(
            graft.tools.Amplify.documents(_, f)))
        val model = graft.ops.LmScore.trainStupidBackoff(
          graft.ops.Sampling.hashSample(docs, "text", 0.5), "text").cache()
        graft.ops.LmScore.scoreAuto(docs, model, "doc_id", "text")
      }),

    // Incremental dedup throughput: a 10% md5-bucket shard arriving
    // into the other 90% as a PERSISTED index (minhashIndex derived
    // once into a cached parquet — the artifact production keeps;
    // re-deriving it per shard was the first cut and doubled the
    // number with work a real ingest never repeats). Production
    // kernel-hash path, cross-side bucket-local verify; l40 is the
    // md5-exact oracle twin. Measures the per-shard ingest cost a
    // continuously-growing corpus actually pays: shard shingling +
    // one (band, band_hash) shuffle + bucket verify.
    QueryDef(
      "x08_dedup_incremental",
      (s, d) => {
        val f = factorFor(s, d, "documents", DocTarget)
        val docs =
          if (f <= 1) Tables.documents(s, d)
            .repartition(s.sparkContext.defaultParallelism)
          else s.read.parquet(amplifiedDir(s, d, "documents", f)(
            graft.tools.Amplify.documents(_, f)))
        val bkt = graft.ops.Sampling.hashBucket(col("text"))
        val index = s.read.parquet(cachedDir(d, s"mhindexc_x$f")(
          graft.ops.Dedup.minhashIndex(docs.filter(bkt < 9000),
            "doc_id", "text")))
        graft.ops.Dedup.minhashNewVsPrebuiltIndex(
          docs.filter(bkt >= 9000), index, "doc_id", "text", threshold = 0.4)
      }),

    // BM25 retrieval throughput: a 16-query batch served from a
    // PERSISTED postings index over the amplified corpus (the
    // tokenize-once artifact production keeps — same contract as
    // x08's minhash index), measuring what a standing keyword-search
    // deployment pays per batch: map-side vocab filter, posting
    // score, O(k)-state top-k. l54 is the correctness twin.
    QueryDef(
      "x09_bm25_topk",
      (s, d) => {
        val f = factorFor(s, d, "documents", DocTarget)
        // doc_id-BUCKETED at-rest layout (r15, replaces the r14
        // doc-clustered parquet): the bucketed scan's partitioning
        // carries the per-(query, doc) score aggregate, so serving
        // runs with no corpus-sized exchange at all — see
        // Retrieval.ensureBm25BucketedIndex. Standing-index contract
        // unchanged: built once (ingest side), serving timed.
        val t = s"bm25bk32_x${f}_${bm25TableTag(d)}"
        this.synchronized {
          graft.ops.Retrieval.ensureBm25BucketedIndex(s, t, {
            val docs =
              if (f <= 1) Tables.documents(s, d)
                .repartition(s.sparkContext.defaultParallelism)
              else s.read.parquet(amplifiedDir(s, d, "documents", f)(
                graft.tools.Amplify.documents(_, f)))
            graft.ops.Retrieval.bm25Index(docs, "doc_id", "text")
          })
        }
        val queries = s.range(16).select(col("id").as("query_id"),
          concat(lit("spark window agg stream "),
            (col("id") % 4).cast("string"),
            lit(" customer vector filter table join")).as("query_text"))
        graft.ops.Retrieval.bm25TopKFromBucketedIndex(s, t, queries, k = 20)
      }),

    // Multimodal decode throughput: dHash every image payload of a
    // PERSISTED 50k-image media table (real javax.imageio decode per
    // row — the map-side cost that dominates any 100 TB image-dedup
    // pass) and aggregate hash groups. Deliberately NOT the pair join:
    // the synthetic fixtures are 2–8 px, so their hash space is tiny
    // and a 50k-image LSH would bench a pathological collision
    // cluster, not decode throughput (the pair path is l56's job at
    // oracle scale, and real-resolution corpora do not share hashes
    // 20k ways). l56 is the correctness twin.
    QueryDef(
      "x10_image_dhash",
      (s, d) => {
        val f = factorFor(s, d, "documents", DocTarget)
        val docs =
          if (f <= 1) Tables.documents(s, d)
            .repartition(s.sparkContext.defaultParallelism)
          else s.read.parquet(amplifiedDir(s, d, "documents", f)(
            graft.tools.Amplify.documents(_, f)))
        val media = s.read.parquet(cachedDir(d, s"imgmedia_x$f")(
          graft.ops.Multimodal.syntheticImages(docs, Long.MaxValue,
            contentMod = 20000)))
        graft.ops.Multimodal.imageDHash(media)
          .groupBy(col("dhash")).agg(count(lit(1)).as("n"))
      }),

    // Video keyframe-dHash throughput (r12 — the x10 contract for the
    // video path): 50k motion-PNG AVI clips (2-4 frames each) derived
    // once into a cached parquet, then RIFF-walk + per-frame PNG
    // decode + dHash + exact keyframe-group dedup. Measures the whole
    // container path (box walk, frame extraction, ImageIO decode) per
    // round; l83 is the correctness twin. contentMod folds ids so
    // hash groups exist without a pathological collision cluster.
    QueryDef(
      "x18_video_keyframes",
      (s, d) => {
        val f = factorFor(s, d, "documents", DocTarget)
        val docs =
          if (f <= 1) Tables.documents(s, d)
            .repartition(s.sparkContext.defaultParallelism)
          else s.read.parquet(amplifiedDir(s, d, "documents", f)(
            graft.tools.Amplify.documents(_, f)))
        val media = s.read.parquet(cachedDir(d, s"vidmedia_x$f")(
          graft.ops.Multimodal.syntheticVideos(docs, Long.MaxValue,
            contentMod = 20000)))
        graft.ops.Multimodal.videoKeyframeDHash(media, everyN = 1)
          .groupBy(col("frame_no"), col("dhash")).agg(count(lit(1)).as("n"))
      }),

    // WARC ingest throughput (r12): scan a 500k-record per-record-gzip
    // WARC export (derived once from the amplified corpus — the shape
    // WarcProbe measured) through html_to_text into a token-count
    // aggregate — the first stage of a crawl ingest, re-measured per
    // round. l84/l85 are the correctness twins.
    QueryDef(
      "x19_warc_ingest",
      (s, d) => {
        val f = factorFor(s, d, "documents", DocTarget * 10)
        val docs = s.read.parquet(amplifiedDir(s, d, "documents", f)(
          graft.tools.Amplify.documents(_, f)))
        val tag = new java.io.File(d).getAbsolutePath.replaceAll("[^A-Za-z0-9]", "_")
        // Version the cached export by its payload template (r12
        // advice: a _done marker keyed by path alone silently reuses a
        // stale fixture across template edits). r13 advice: the hash is
        // computed from the SAME constants the payload expression uses
        // (X19PayloadPrefix/Mid/Suffix below), so editing the template
        // cannot leave a stale hand-maintained copy behind.
        val tver = java.lang.Integer.toHexString(
          (X19PayloadPrefix + "|" + X19PayloadMid + "|" + X19PayloadSuffix).hashCode)
        val out = new java.io.File(
          sys.props("java.io.tmpdir"), s"graft_bench_warc_x$f${tag}_$tver")
        this.synchronized {
          if (!new java.io.File(out, "_done").exists()) {
            out.mkdirs()
            graft.ops.Writers.copyWarcSharded(
              docs.select(
                concat(lit("https://example.org/doc/"), col("doc_id")).as("target_uri"),
                lit("response").as("warc_type"),
                lit("application/http;msgtype=response").as("content_type"),
                encode(concat(
                  lit(X19PayloadPrefix),
                  col("doc_id"), lit(X19PayloadMid), col("text"),
                  lit(X19PayloadSuffix)), "UTF-8").as("payload")),
              out.getAbsolutePath + "/part-{SHARD}.warc.gz")
            new java.io.FileOutputStream(new java.io.File(out, "_done")).close()
          }
        }
        s.read.format("warc").load(out.getAbsolutePath + "/part-*.warc.gz")
          .select(graft.ops.Html.htmlToText(decode(col("payload"), "UTF-8")).as("t"))
          .select(size(split(col("t"), " ")).as("nt"))
          .agg(sum(col("nt")).as("n_tokens"), count(lit(1)).as("n_docs"))
      }),

    // Link-graph PageRank at 500k nodes / 1.5M edges, 5 iterations —
    // tracks the one-shuffle-per-iteration claim (GraphRank scaladoc)
    // as a wall-time number. The hub edge (src % 1024) skews in-degree
    // like a real web graph. No DuckDB denominator by construction
    // (the recursive-CTE twin is quadratic-in-iterations there).
    QueryDef(
      "x11_pagerank",
      (s, _) => {
        val n = 500000L
        val ids = s.range(0, n).select(col("id").as("src"))
        val edges = ids.select(col("src"),
            ((col("src") * 37 + 11) % n).as("dst"))
          .union(ids.select(col("src"), ((col("src") * 53 + 7) % n).as("dst")))
          .union(ids.select(col("src"), (col("src") % 1024).as("dst")))
        graft.ops.GraphRank.pageRank(edges, iters = 5)
          .orderBy(col("rank").desc).limit(20)
      }),

    // End-to-end tokenize-and-pack: train 30 BPE merges on the
    // amplified corpus, BPE-encode every document to dense symbol ids
    // (the merge loop runs once per DISTINCT word, never per
    // occurrence), and EMIT the actual packed id sequences at budget
    // 2048 over 64 bucket streams (r8 verdict #4 — a production
    // ingest's output is the packed corpus, not just its layout; the
    // l67 oracle row pins the id arrays bit-for-bit at gate scale).
    QueryDef(
      "x12_tokenize_pack",
      (s, d) => {
        val f = factorFor(s, d, "documents", DocTarget)
        val docs =
          if (f <= 1) Tables.documents(s, d)
            .repartition(s.sparkContext.defaultParallelism)
          else s.read.parquet(amplifiedDir(s, d, "documents", f)(
            graft.tools.Amplify.documents(_, f)))
        // tokenize the corpus for word counts ONCE; train and pack
        // consume the same persisted frame (both consume it eagerly at
        // construction, so it is unpersisted before the plan returns)
        val wc = graft.ops.BpeTrainer.wordCounts(docs, "text").persist()
        val merges = graft.ops.BpeTrainer.trainMergesAuto(docs, "text", 30,
          precomputedWordCounts = Some(wc))
        val out = graft.ops.BpeTrainer.packTokenIds(docs, "doc_id", "text",
          merges, budget = 2048, buckets = 64,
          precomputedWordCounts = Some(wc))
        wc.unpersist()
        out
      }),

    // Exact-substring dedup at the published span length (50 tokens,
    // Lee et al.) over the amplified corpus, FNV production hash —
    // tracks the O(corpus)-shuffle claim (one fingerprint exchange +
    // the duplicated-starts island merge) as a wall-time number. l68
    // is the md5-family correctness twin at gate scale.
    QueryDef(
      "x13_exact_substr",
      (s, d) => {
        val f = factorFor(s, d, "documents", DocTarget)
        val docs =
          if (f <= 1) Tables.documents(s, d)
            .repartition(s.sparkContext.defaultParallelism)
          else s.read.parquet(amplifiedDir(s, d, "documents", f)(
            graft.tools.Amplify.documents(_, f)))
        graft.ops.CorpusStats.exactSubstrSpans(docs, "doc_id", "text",
          minTokens = 50, minCount = 2, exactHash = false)
      }),

    // Embedding-cluster pipeline at 50k vectors (same amplified corpus
    // as x04): JL-project 64→16 dims (map-only), then SemDeDup over
    // the PROJECTED vectors — k=64 clusters, 2 Lloyd's rounds, within-
    // cluster cosine prune. Tracks the clustering family's two scale
    // claims as wall-time numbers: assignment stays map-side (literal
    // centroids, no corpus join) and candidates stay cluster-local.
    // l69/l70/l71 are the oracle-exact twins at gate scale.
    QueryDef(
      "x14_semdedup",
      (s, d) => {
        val f = factorFor(s, d, "embeddings", EmbTarget)
        val emb =
          if (f <= 1) Tables.embeddings(s, d)
            .repartition(s.sparkContext.defaultParallelism)
          else s.read.parquet(amplifiedDir(s, d, "embeddings", f)(
            graft.tools.Amplify.embeddings(_, f)))
        val proj = graft.ops.Clustering.randomProjectVec(
            emb, "vec_id", "embedding", dim = 64, outDim = 16)
          .select(col("vec_id"),
            expr("transform(embedding, x -> cast(x as float))").as("embedding"))
        graft.ops.Clustering.semDedup(proj, "vec_id", "embedding",
          k = 64, iters = 2, tau = 0.99)
          .groupBy(col("is_dup")).agg(count(lit(1)).as("n"))
      }),

    // ===== 500k tier (r10 verdict #2) =====
    // x05/x06/x09 are toy-scale-unfavorable at the 50k bench point
    // (DuckDB's single-process zero-exchange pipeline wins while the
    // per-stage floor dominates) and documented to INVERT by 500k —
    // but until now the inversion lived only in HEAVY_BASELINE prose.
    // These three rows RECORD it: the same operators at DocTarget
    // 500k (the ×100 amplified dir the x15 pipeline already derives),
    // with the HEAVY_BASELINE 500k DuckDB denominators re-measured
    // this round alongside. y05/y06 run on the amplified REAL text
    // (the shape the 500k denominators time), y09 serves from the
    // 500k persisted postings index.
    QueryDef(
      "y05_line_dedup_500k",
      (s, d) => {
        val f = factorFor(s, d, "documents", 500000L)
        val docs = s.read.parquet(amplifiedDir(s, d, "documents", f)(
          graft.tools.Amplify.documents(_, f)))
        graft.ops.CorpusStats.dedupLines(docs, "doc_id", "text", minDocs = 3)
      }),

    QueryDef(
      "y06_dup_spans_500k",
      (s, d) => {
        val f = factorFor(s, d, "documents", 500000L)
        val docs = s.read.parquet(amplifiedDir(s, d, "documents", f)(
          graft.tools.Amplify.documents(_, f)))
        graft.ops.CorpusStats.dupChunkFraction(docs, "doc_id", "text",
          chunkTokens = 5, minDocs = 2, exactHash = false)
      }),

    QueryDef(
      "y09_bm25_topk_500k",
      (s, d) => {
        val f = factorFor(s, d, "documents", 500000L)
        // doc_id-bucketed at-rest layout (r15) — the x09 rationale at
        // the 500k tier, where the removed (query, doc) score exchange
        // measured 271 MB per batch (r14 record)
        val t = s"bm25bk32_x${f}_${bm25TableTag(d)}"
        this.synchronized {
          graft.ops.Retrieval.ensureBm25BucketedIndex(s, t, {
            val docs = s.read.parquet(amplifiedDir(s, d, "documents", f)(
              graft.tools.Amplify.documents(_, f)))
            graft.ops.Retrieval.bm25Index(docs, "doc_id", "text")
          })
        }
        val queries = s.range(16).select(col("id").as("query_id"),
          concat(lit("spark window agg stream "),
            (col("id") % 4).cast("string"),
            lit(" customer vector filter table join")).as("query_text"))
        graft.ops.Retrieval.bm25TopKFromBucketedIndex(s, t, queries, k = 20)
      }),

    // y09's partition-pruned twin (the at-rest layout
    // Retrieval.bm25WritePartitionedIndex prescribes): the same 16
    // queries served from the SAME 500k postings rewritten
    // term-bucket-partitioned — the serving batch's vocabulary (~11
    // terms) resolves to ≤11 of 256 buckets, so the scan reads those
    // directories only, where y09's flat read scans the whole index
    // and discards non-vocab postings row-by-row. The y09/y10 delta
    // IS the input-bound saving the layout buys; at 100 TB it is the
    // difference between a per-batch corpus scan and a per-batch
    // touch of vocabulary-sized data. y10_bm25_partitioned_check runs
    // this chain under the driver oracle at gate scale.
    QueryDef(
      "y10_bm25_partitioned_500k",
      (s, d) => {
        val f = factorFor(s, d, "documents", 500000L)
        // r15: term_bucket partition pruning COMPOSED with doc_id
        // bucketing — the pruned listing keeps y10's input-bound win,
        // and the bucketed scan's partitioning replaces the doc-keyed
        // re-spread exchange (216 MB at this bench point, r14 record)
        val t = s"bm25pbk32_x${f}_${bm25TableTag(d)}"
        this.synchronized {
          graft.ops.Retrieval.ensureBm25BucketedIndex(s, t, {
            val docs = s.read.parquet(amplifiedDir(s, d, "documents", f)(
              graft.tools.Amplify.documents(_, f)))
            graft.ops.Retrieval.bm25Index(docs, "doc_id", "text")
          }, termBuckets = 256)
        }
        val queries = s.range(16).select(col("id").as("query_id"),
          concat(lit("spark window agg stream "),
            (col("id") % 4).cast("string"),
            lit(" customer vector filter table join")).as("query_text"))
        graft.ops.Retrieval.bm25TopKFromBucketedIndex(s, t, queries, k = 20)
      }),

    // x07's 500k twin (r11 verdict #4): HEAVY_BASELINE's x07 DuckDB
    // denominator is measured at the ×100/500k corpus while x07
    // benches at DocTarget 50k — the committed ratio paired numbers
    // from different scales. This row runs the identical scoreAuto
    // serving shape at the 500k tier, giving the baseline row a
    // same-scale numerator; x07 keeps the 50k tier with a 50k
    // denominator re-measured in HEAVY_BASELINE alongside.
    QueryDef(
      "y07_lm_score_500k",
      (s, d) => {
        val f = factorFor(s, d, "documents", 500000L)
        val docs = s.read.parquet(amplifiedDir(s, d, "documents", f)(
          graft.tools.Amplify.documents(_, f)))
        val model = graft.ops.LmScore.trainStupidBackoff(
          graft.ops.Sampling.hashSample(docs, "text", 0.5), "text").cache()
        graft.ops.LmScore.scoreAuto(docs, model, "doc_id", "text")
      }),

    // The composed ingest pipeline at 500k amplified docs (l76's
    // user-story chain at 10× the gate corpus): curation rules gate →
    // decontamination by span excision (FNV production hash; benchmark
    // = the %23 slice) → temperature language mix over the cleaned
    // text, reduced to per-stratum keep counts. Tracks the end-to-end
    // wall time a production ingest actually pays.
    QueryDef(
      "x15_ingest_pipeline",
      (s, d) => {
        val f = factorFor(s, d, "documents", 500000L)
        val docs = s.read.parquet(amplifiedDir(s, d, "documents", f)(
          graft.tools.Amplify.documents(_, f)))
        // r15: the fused decontaminateExcise consumes its corpus ONCE
        // (the benchmark fp set is collected/broadcast and every doc
        // windows + excises locally), so the gated corpus needs NO
        // upstream materialization — the r14 chain paid a 170 MB
        // localCheckpoint for excise's two reads plus a 500k×500k
        // doc_id join to re-attach `lang`; both are gone (carryCols).
        val kept = docs.filter(
          graft.ops.Curation.gopherReason(col("text"), col("lang"),
            minTokens = 40).isNull)
          .select(col("doc_id"), col("text"), col("lang"))
        val excised = graft.ops.Decontaminate.decontaminateExcise(kept,
            docs.filter(col("doc_id") % 23 === 0), "doc_id", "text",
            n = 8, exactHash = false, carryCols = Seq("lang"))
          .select(col("doc_id"), col("cleaned_text").as("text"),
            col("lang"))
          // columnar persist, not localCheckpoint (the x17 §5 lesson,
          // now that the frame is the chain's ONLY materialization):
          // temperatureMix reads it twice — the stratum-count pass
          // materializes the cache as a side effect of its own job
          // (one job fewer than an eager checkpoint) and reads only
          // the lang/doc_id batches the second pass doesn't re-pay.
          // Lifecycle: bench reps re-persist ~25 MB each; the storage
          // pool evicts LRU, the x17 precedent.
          .persist()
        graft.ops.Sampling.temperatureMix(excised,
            "doc_id", "text", "lang", budgetDocs = 100000L)
          .groupBy(col("stratum")).agg(count(lit(1)).as("n_kept"))
      })
  )
}
