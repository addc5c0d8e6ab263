package graft.ops

import graft.kernel.{FastxCodec, SamCodec}
import org.apache.spark.sql.{DataFrame, Row}
import java.io.{BufferedWriter, FileOutputStream, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream

/** COPY sinks (2G): FASTQ / FASTA / SAM text writers.
  *
  * Semantics per the reference's copy functions
  * (reference: src/copy_fastq.cpp, src/copy_fasta.cpp, src/copy_sam
  * .cpp, src/copy_format_common.cpp:111-208): paired output either
  * interleaved or split via a `{ORIENTATION}` path placeholder
  * (paired + non-interleave REQUIRES the placeholder, single-end
  * FORBIDS it), qual length must equal sequence length, SAM SEQ/QUAL
  * always written `*`, header `@SQ` lines from a reference-lengths
  * relation with unknown references auto-added at sentinel length
  * 2^31−1, gzip by `.gz` extension.
  *
  * These produce ONE file per call, so rows are streamed through the
  * driver (toLocalIterator — bounded memory); this matches the
  * reference's mutex-serialized single-file writers (src/copy_sam
  * .cpp:689-694). For sharded multi-file output at scale, write
  * per-partition paths upstream and call per shard.
  */
object Writers {

  /** COMPRESSION option (reference src/copy_format_common.cpp:77-107,
    * src/copy_sam.cpp CIEquals(comp_value, "uncompressed")): explicit
    * 'gzip'/'gz' forces gzip; 'none'/'uncompressed' force plain output
    * even with a `.gz` extension; names are case-insensitive
    * (Locale.ROOT — a Turkish-locale JVM lowercases 'GZIP' to 'gzıp'
    * under the default locale), anything else errors; absent →
    * auto-detect by `.gz` extension.
    */
  private[ops] def resolveGzip(path: String, compression: Option[String]): Boolean =
    compression.map(_.toLowerCase(java.util.Locale.ROOT)) match {
      case Some("gzip") | Some("gz")          => true
      case Some("none") | Some("uncompressed") => false
      case Some(other) => throw new IllegalArgumentException(
        s"Unknown compression type: $other (supported: gzip, none, uncompressed)")
      case None => path.endsWith(".gz")
    }

  /** COMPRESSION_LEVEL option (reference src/copy_sam.cpp:251-254,
    * 280-282): BAM-only, 0–9; -1 = library default.
    */
  private def validateLevel(level: Int): Int = {
    if (level < -1 || level > 9) throw new IllegalArgumentException(
      s"COMPRESSION_LEVEL must be between 0 and 9, got $level")
    level
  }

  private def openWriter(path: String, compression: Option[String] = None): BufferedWriter = {
    val fos = new FileOutputStream(path)
    val out = if (resolveGzip(path, compression)) new GZIPOutputStream(fos) else fos
    new BufferedWriter(new OutputStreamWriter(out, StandardCharsets.UTF_8))
  }

  private val OrientationToken = "{ORIENTATION}"

  private def fastxRecord(r: Row, seqCol: String, qualCol: String): FastxCodec.FastxRecord = {
    val comment =
      if (r.schema.fieldNames.contains("comment")) Option(r.getAs[String]("comment")) else None
    val qual =
      if (r.schema.fieldNames.contains(qualCol))
        Option(r.getAs[scala.collection.Seq[Short]](qualCol)).map(_.toArray)
      else None
    FastxCodec.FastxRecord(r.getAs[String]("read_id"), comment,
      r.getAs[String](seqCol), qual)
  }

  /** COPY ... (FORMAT FASTQ). Required cols: read_id, sequence1, qual1;
    * optional comment, sequence2, qual2.
    */
  def copyFastq(
      df: DataFrame,
      path: String,
      qualOffset: Int = 33,
      includeComment: Boolean = false,
      interleave: Boolean = false,
      compression: Option[String] = None): Unit = {
    val paired = df.schema.fieldNames.contains("sequence2")
    validatePairedPath(path, paired, interleave)
    if (paired && !interleave) {
      val w1 = openWriter(path.replace(OrientationToken, "R1"), compression)
      val w2 = openWriter(path.replace(OrientationToken, "R2"), compression)
      try df.toLocalIterator().forEachRemaining { r =>
        w1.write(FastxCodec.toFastq(fastxRecord(r, "sequence1", "qual1"), qualOffset, includeComment)); w1.newLine()
        if (r.getAs[String]("sequence2") != null) {
          w2.write(FastxCodec.toFastq(fastxRecord(r, "sequence2", "qual2"), qualOffset, includeComment)); w2.newLine()
        }
      } finally { w1.close(); w2.close() }
    } else {
      val w = openWriter(path, compression)
      try df.toLocalIterator().forEachRemaining { r =>
        w.write(FastxCodec.toFastq(fastxRecord(r, "sequence1", "qual1"), qualOffset, includeComment)); w.newLine()
        if (paired && r.getAs[String]("sequence2") != null) {
          w.write(FastxCodec.toFastq(fastxRecord(r, "sequence2", "qual2"), qualOffset, includeComment)); w.newLine()
        }
      } finally w.close()
    }
  }

  /** COPY ... (FORMAT FASTA). Required cols: read_id, sequence1. */
  def copyFasta(
      df: DataFrame,
      path: String,
      includeComment: Boolean = false,
      interleave: Boolean = false,
      compression: Option[String] = None): Unit = {
    val paired = df.schema.fieldNames.contains("sequence2")
    validatePairedPath(path, paired, interleave)
    if (paired && !interleave) {
      val w1 = openWriter(path.replace(OrientationToken, "R1"), compression)
      val w2 = openWriter(path.replace(OrientationToken, "R2"), compression)
      try df.toLocalIterator().forEachRemaining { r =>
        w1.write(FastxCodec.toFasta(fastxRecord(r, "sequence1", "qual1"), includeComment)); w1.newLine()
        if (r.getAs[String]("sequence2") != null) {
          w2.write(FastxCodec.toFasta(fastxRecord(r, "sequence2", "qual2"), includeComment)); w2.newLine()
        }
      } finally { w1.close(); w2.close() }
    } else {
      val w = openWriter(path, compression)
      try df.toLocalIterator().forEachRemaining { r =>
        w.write(FastxCodec.toFasta(fastxRecord(r, "sequence1", "qual1"), includeComment)); w.newLine()
        if (paired && r.getAs[String]("sequence2") != null) {
          w.write(FastxCodec.toFasta(fastxRecord(r, "sequence2", "qual2"), includeComment)); w.newLine()
        }
      } finally w.close()
    }
  }

  private def validatePairedPath(path: String, paired: Boolean, interleave: Boolean): Unit = {
    val hasToken = path.contains(OrientationToken)
    if (paired && !interleave && !hasToken)
      throw new IllegalArgumentException(
        s"Paired non-interleaved output requires $OrientationToken in path")
    if ((!paired || interleave) && hasToken)
      throw new IllegalArgumentException(
        s"$OrientationToken is only valid for paired non-interleaved output")
  }

  /** Sentinel length for @SQ entries not present in the reference-
    * lengths relation (reference copy_sam.cpp:444-465).
    */
  val UnknownReferenceLength: Long = Int.MaxValue.toLong

  private def rowToSamRecord(r: Row, names: Set[String]): SamCodec.SamRecord = {
    def optLong(c: String): Option[Long] =
      if (names.contains(c) && !r.isNullAt(r.fieldIndex(c))) Some(r.getAs[Long](c)) else None
    def optStr(c: String): Option[String] =
      if (names.contains(c)) Option(r.getAs[String](c)) else None
    SamCodec.SamRecord(
      r.getAs[String]("read_id"),
      r.getAs[Number]("flags").intValue(),
      r.getAs[String]("reference"),
      r.getAs[Number]("position").longValue(),
      0L,
      r.getAs[Number]("mapq").shortValue(),
      r.getAs[String]("cigar"),
      r.getAs[String]("mate_reference"),
      r.getAs[Number]("mate_position").longValue(),
      r.getAs[Number]("template_length").longValue(),
      optLong("tag_as"), optLong("tag_xs"), optLong("tag_ys"),
      optLong("tag_xn"), optLong("tag_xm"), optLong("tag_xo"),
      optLong("tag_xg"), optLong("tag_nm"),
      optStr("tag_yt"), optStr("tag_md"), optStr("tag_sa"),
      None, None)
  }

  /** COPY ... (FORMAT BAM): BGZF binary output. BAM forces a header
    * (reference copy_sam.cpp:285-301); references come from the
    * reference-lengths relation plus sentinel-length auto-added
    * unknowns; SEQ/QUAL always absent.
    */
  def copyBam(
      df: DataFrame,
      path: String,
      referenceLengths: Option[DataFrame] = None,
      compressionLevel: Int = -1): Unit = {
    validateLevel(compressionLevel)
    val known = referenceLengths
      .map(_.collect().map(r => r.getString(0) -> r.getLong(1)).toVector)
      .getOrElse(Vector.empty)
    val knownNames = known.map(_._1).toSet
    val dataRefs = df.select("reference").distinct().collect()
      .map(_.getString(0)).filter(r => r != "*" && !knownNames.contains(r)).sorted
    val refs = known ++ dataRefs.map(_ -> UnknownReferenceLength)
    val w = new graft.kernel.BamWriter(new FileOutputStream(path), refs,
      compressionLevel)
    try {
      val names = df.schema.fieldNames.toSet
      df.toLocalIterator().forEachRemaining(r => w.writeRecord(rowToSamRecord(r, names)))
    } finally w.close()
  }

  /** COPY ... (FORMAT SAM). Required cols: the 9 mandatory SAM columns;
    * tag_* columns written when present. SEQ/QUAL always `*`.
    */
  def copySam(
      df: DataFrame,
      path: String,
      includeHeader: Boolean = true,
      referenceLengths: Option[DataFrame] = None,
      compression: Option[String] = None): Unit = {
    val w = openWriter(path, compression)
    try {
      if (includeHeader) samHeaderLines(df, referenceLengths).foreach { l =>
        w.write(l); w.newLine()
      }
      val names = df.schema.fieldNames.toSet
      df.toLocalIterator().forEachRemaining { r =>
        w.write(SamCodec.toLine(rowToSamRecord(r, names))); w.newLine()
      }
    } finally w.close()
  }

  private def samHeaderLines(
      df: DataFrame, referenceLengths: Option[DataFrame]): Seq[String] = {
    val known = referenceLengths
      .map(_.collect().map(r => r.getString(0) -> r.getLong(1)).toVector)
      .getOrElse(Vector.empty)
    val knownNames = known.map(_._1).toSet
    // unknown refs appearing in the data get the sentinel length
    val dataRefs = df.select("reference").distinct().collect()
      .map(_.getString(0)).filter(r => r != "*" && !knownNames.contains(r)).sorted
    "@HD\tVN:1.6\tSO:unknown" +:
      (known ++ dataRefs.map(_ -> UnknownReferenceLength)).map {
        case (name, len) => s"@SQ\tSN:$name\tLN:$len"
      }
  }

  // ---------------------------------------------------------------------
  // Sharded (multi-file, executor-written) variants — the 100 TB path.
  //
  // The single-file writers above stream through the driver for parity
  // with the reference's mutex-serialized writers; at scale that is a
  // driver bottleneck by construction. These write ONE FILE PER
  // PARTITION directly from the executors (no driver hop, no shuffle),
  // with the partition id substituted for `{SHARD}` in the path
  // template — the same templating contract as `{ORIENTATION}`. Files
  // are created overwrite=true through the Hadoop FS (task retries are
  // idempotent; disable speculative execution for these sinks, or
  // point the template at a job-scoped directory that is committed by
  // rename, if running with speculation on). Empty partitions produce
  // no file. Each SAM shard carries the full header, so every shard is
  // a valid standalone SAM file and `cat shards | grep -v '^@'`
  // reassembles the record stream.
  // ---------------------------------------------------------------------

  private val ShardToken = "{SHARD}"

  private def serializableConf(df: DataFrame): org.apache.spark.util.SerializableConfiguration =
    new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)

  private def openShardWriter(
      path: String, conf: org.apache.hadoop.conf.Configuration,
      compression: Option[String] = None): BufferedWriter = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    // no .crc sidecars next to user-visible shard files
    fs.setWriteChecksum(false)
    val raw = fs.create(p, true)
    val out = if (resolveGzip(path, compression)) new GZIPOutputStream(raw) else raw
    new BufferedWriter(new OutputStreamWriter(out, StandardCharsets.UTF_8))
  }

  private def requireShardToken(template: String): Unit =
    require(template.contains(ShardToken),
      s"sharded output path must contain $ShardToken: $template")

  private def shardPath(template: String, shard: Int): String =
    template.replace(ShardToken, f"$shard%05d")

  /** Sharded COPY FASTQ: one `path` file per non-empty partition.
    * Paired non-interleaved output needs BOTH tokens (e.g.
    * `out/part-{SHARD}.{ORIENTATION}.fq.gz`).
    */
  def copyFastqSharded(
      df: DataFrame,
      pathTemplate: String,
      qualOffset: Int = 33,
      includeComment: Boolean = false,
      interleave: Boolean = false,
      compression: Option[String] = None): Unit = {
    requireShardToken(pathTemplate)
    val paired = df.schema.fieldNames.contains("sequence2")
    validatePairedPath(pathTemplate, paired, interleave)
    val conf = serializableConf(df)
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val base = shardPath(pathTemplate, org.apache.spark.TaskContext.getPartitionId())
        if (paired && !interleave) {
          val w1 = openShardWriter(base.replace(OrientationToken, "R1"), conf.value, compression)
          val w2 = openShardWriter(base.replace(OrientationToken, "R2"), conf.value, compression)
          try rows.foreach { r =>
            w1.write(FastxCodec.toFastq(fastxRecord(r, "sequence1", "qual1"), qualOffset, includeComment)); w1.newLine()
            if (r.getAs[String]("sequence2") != null) {
              w2.write(FastxCodec.toFastq(fastxRecord(r, "sequence2", "qual2"), qualOffset, includeComment)); w2.newLine()
            }
          } finally { w1.close(); w2.close() }
        } else {
          val w = openShardWriter(base, conf.value, compression)
          try rows.foreach { r =>
            w.write(FastxCodec.toFastq(fastxRecord(r, "sequence1", "qual1"), qualOffset, includeComment)); w.newLine()
            if (paired && r.getAs[String]("sequence2") != null) {
              w.write(FastxCodec.toFastq(fastxRecord(r, "sequence2", "qual2"), qualOffset, includeComment)); w.newLine()
            }
          } finally w.close()
        }
      }
    }
  }

  /** Sharded COPY FASTA: one `path` file per non-empty partition. */
  def copyFastaSharded(
      df: DataFrame,
      pathTemplate: String,
      includeComment: Boolean = false,
      interleave: Boolean = false,
      compression: Option[String] = None): Unit = {
    requireShardToken(pathTemplate)
    val paired = df.schema.fieldNames.contains("sequence2")
    validatePairedPath(pathTemplate, paired, interleave)
    val conf = serializableConf(df)
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val base = shardPath(pathTemplate, org.apache.spark.TaskContext.getPartitionId())
        if (paired && !interleave) {
          val w1 = openShardWriter(base.replace(OrientationToken, "R1"), conf.value, compression)
          val w2 = openShardWriter(base.replace(OrientationToken, "R2"), conf.value, compression)
          try rows.foreach { r =>
            w1.write(FastxCodec.toFasta(fastxRecord(r, "sequence1", "qual1"), includeComment)); w1.newLine()
            if (r.getAs[String]("sequence2") != null) {
              w2.write(FastxCodec.toFasta(fastxRecord(r, "sequence2", "qual2"), includeComment)); w2.newLine()
            }
          } finally { w1.close(); w2.close() }
        } else {
          val w = openShardWriter(base, conf.value, compression)
          try rows.foreach { r =>
            w.write(FastxCodec.toFasta(fastxRecord(r, "sequence1", "qual1"), includeComment)); w.newLine()
            if (paired && r.getAs[String]("sequence2") != null) {
              w.write(FastxCodec.toFasta(fastxRecord(r, "sequence2", "qual2"), includeComment)); w.newLine()
            }
          } finally w.close()
        }
      }
    }
  }

  /** Sharded COPY BAM: one standalone BAM (BGZF binary) per non-empty
    * partition, written directly by executors. The @SQ reference set is
    * computed ONCE on the driver (union over all shards — an executor
    * cannot know it locally) so every shard shares identical reference
    * ids and `samtools cat`-style concatenation is well-defined. This
    * is the 100 TB default; the single-file [[copyBam]] mirrors the
    * reference's mutex-serialized writer (src/copy_sam.cpp:689-694)
    * and exists for drop-in parity.
    */
  def copyBamSharded(
      df: DataFrame,
      pathTemplate: String,
      referenceLengths: Option[DataFrame] = None,
      compressionLevel: Int = -1): Unit = {
    requireShardToken(pathTemplate)
    validateLevel(compressionLevel)
    val known = referenceLengths
      .map(_.collect().map(r => r.getString(0) -> r.getLong(1)).toVector)
      .getOrElse(Vector.empty)
    val knownNames = known.map(_._1).toSet
    val dataRefs = df.select("reference").distinct().collect()
      .map(_.getString(0)).filter(r => r != "*" && !knownNames.contains(r)).sorted
    val refs = known ++ dataRefs.map(_ -> UnknownReferenceLength)
    val names = df.schema.fieldNames.toSet
    val conf = serializableConf(df)
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val path = shardPath(pathTemplate, org.apache.spark.TaskContext.getPartitionId())
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(conf.value)
        fs.setWriteChecksum(false)
        val w = new graft.kernel.BamWriter(fs.create(p, true), refs,
          compressionLevel)
        try rows.foreach(r => w.writeRecord(rowToSamRecord(r, names)))
        finally w.close()
      }
    }
  }

  /** Sharded COPY BIOM: the COO relation is hash-partitioned BY
    * SAMPLE into `numShards` shards and each shard is written as a
    * complete, valid BIOM 2.1 (HDF5) file holding a disjoint sample
    * subset — the natural split for a feature table (per-sample
    * columns are never divided across files, so any shard can be
    * loaded or merged downstream with plain read_biom + UNION ALL).
    * Executor memory is bounded by the largest shard, never the whole
    * matrix; the single-file [[BiomOps.copyBiom]] remains the parity
    * writer. Duplicate (sample, feature) values are summed and zeros
    * dropped BEFORE sharding, identical to the single-file semantics
    * (reference: README.md:2588-2594).
    */
  def copyBiomSharded(
      df: DataFrame,
      pathTemplate: String,
      numShards: Int,
      compression: String = "gzip"): Unit = {
    requireShardToken(pathTemplate)
    require(numShards > 0, s"numShards must be positive: $numShards")
    val cols = df.schema.fieldNames.toSet
    for (c <- Seq("sample_id", "feature_id", "value"))
      require(cols.contains(c), s"BIOM output requires column $c")
    val nulls = df.filter(org.apache.spark.sql.functions.col("sample_id").isNull ||
      org.apache.spark.sql.functions.col("feature_id").isNull ||
      org.apache.spark.sql.functions.col("value").isNull).count()
    if (nulls > 0)
      throw new IllegalArgumentException(s"BIOM output forbids NULLs ($nulls offending rows)")
    import org.apache.spark.sql.functions.{col, sum}
    val canonical = df.groupBy("sample_id", "feature_id")
      .agg(sum(col("value")).as("value"))
      .filter(col("value") =!= 0.0)
      .repartition(numShards, col("sample_id"))
    val conf = serializableConf(df)
    canonical.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val coo = new scala.collection.mutable.ArrayBuffer[(String, String, Double)]()
        rows.foreach(r => coo += ((r.getString(0), r.getString(1), r.getDouble(2))))
        val path = shardPath(pathTemplate, org.apache.spark.TaskContext.getPartitionId())
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(conf.value)
        fs.setWriteChecksum(false)
        val out = fs.create(p, true)
        try out.write(graft.kernel.Hdf5BiomWriter.write(coo.toSeq, compression = compression))
        finally out.close()
      }
    }
  }

  /** Sharded COPY SAM: one `path` file per non-empty partition, each
    * carrying the full header (computed once on the driver — the @SQ
    * set must be the union over ALL shards, which an executor cannot
    * know locally).
    */
  def copySamSharded(
      df: DataFrame,
      pathTemplate: String,
      includeHeader: Boolean = true,
      referenceLengths: Option[DataFrame] = None,
      compression: Option[String] = None): Unit = {
    requireShardToken(pathTemplate)
    val header = if (includeHeader) samHeaderLines(df, referenceLengths) else Seq.empty
    val names = df.schema.fieldNames.toSet
    val conf = serializableConf(df)
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val w = openShardWriter(
          shardPath(pathTemplate, org.apache.spark.TaskContext.getPartitionId()),
          conf.value, compression)
        try {
          header.foreach { l => w.write(l); w.newLine() }
          rows.foreach { r => w.write(SamCodec.toLine(rowToSamRecord(r, names))); w.newLine() }
        } finally w.close()
      }
    }
  }

  // ------------------------------------------------------------------
  // COPY WARC (LLM-pipeline surface — pairs with the `warc` source)
  // ------------------------------------------------------------------

  /** Row → WARC record: `target_uri` + binary `payload` mandatory;
    * `warc_type`/`content_type`/`warc_date`/`record_id` override the
    * defaults when present as columns. Raw record writer — HTTP
    * wrapping (if wanted) is the caller's payload to build.
    */
  private def warcRecord(r: Row, names: Set[String]): (Seq[(String, String)], Array[Byte]) = {
    def opt(c: String, dflt: String): String =
      if (names(c) && !r.isNullAt(r.fieldIndex(c))) r.getAs[String](c) else dflt
    val payload = r.getAs[Array[Byte]]("payload")
    (Seq(
      "WARC-Type" -> opt("warc_type", "resource"),
      "WARC-Target-URI" -> r.getAs[String]("target_uri"),
      "WARC-Date" -> opt("warc_date", "1970-01-01T00:00:00Z"),
      "WARC-Record-ID" -> opt("record_id", "<urn:graft:record>"),
      "Content-Type" -> opt("content_type", "application/octet-stream")),
      if (payload == null) Array.empty[Byte] else payload)
  }

  /** Single-file COPY WARC (driver-streamed, bounded memory). A `.gz`
    * path writes one gzip member per record (Common Crawl convention).
    */
  def copyWarc(df: DataFrame, path: String): Unit = {
    val names = df.schema.fieldNames.toSet
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    fs.setWriteChecksum(false)
    val out = fs.create(p, true)
    val gz = path.endsWith(".gz")
    try {
      val it = df.toLocalIterator()
      graft.kernel.WarcCodec.write(out,
        new Iterator[(Seq[(String, String)], Array[Byte])] {
          def hasNext = it.hasNext
          def next() = warcRecord(it.next(), names)
        }, gzipPerRecord = gz)
    } finally out.close()
  }

  /** Sharded COPY WARC: one file per non-empty partition — the shape a
    * 100 TB export actually uses (crawl convention: many ~1 GB
    * .warc.gz files). `pathTemplate` must contain {SHARD}.
    */
  def copyWarcSharded(df: DataFrame, pathTemplate: String): Unit = {
    requireShardToken(pathTemplate)
    val names = df.schema.fieldNames.toSet
    val conf = serializableConf(df)
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val path = shardPath(pathTemplate, org.apache.spark.TaskContext.getPartitionId())
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(conf.value)
        fs.setWriteChecksum(false)
        val out = fs.create(p, true)
        try graft.kernel.WarcCodec.write(out,
          rows.map(warcRecord(_, names)), gzipPerRecord = path.endsWith(".gz"))
        finally out.close()
      }
    }
  }
}
