package graft.ops

import graft.kernel.SeedAligner
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Alignment compute operators (reference: src/align_minimap2.cpp,
  * src/save_minimap2_index.cpp, src/align_minimap2_sharded.cpp,
  * src/align_bowtie2.cpp).
  *
  * Scale shape (SURVEY §3.3): the reference's internal-SQL pagination
  * disappears — queries are a DataFrame; subjects are collected on the
  * driver (the reference's own "must fit in RAM" bind-time constraint)
  * and shipped as a broadcast index; alignment runs in mapPartitions.
  * The sharded variant repartitions queries by shard so each task
  * loads exactly one shard index — the reference's thread-per-shard
  * scheduling becomes Spark tasks.
  */
object AlignOps {

  /** Output: the 21-col alignment schema subset this aligner fills
    * (unfilled mate fields follow unmapped-single-end conventions).
    */
  val outputSchema: StructType = StructType(Seq(
    StructField("read_id", StringType), StructField("flags", IntegerType),
    StructField("reference", StringType), StructField("position", LongType),
    StructField("stop_position", LongType), StructField("mapq", ShortType),
    StructField("cigar", StringType), StructField("mate_reference", StringType),
    StructField("mate_position", LongType), StructField("template_length", LongType),
    StructField("tag_as", LongType), StructField("tag_nm", LongType)))

  /** align_minimap2(queries, subjects): subjects collected + broadcast,
    * queries aligned per partition. Unmapped reads get flag 0x4 rows
    * (the reference emits them too; filter downstream if undesired).
    */
  def alignMinimap2(
      queries: DataFrame,
      subjects: DataFrame,
      k: Int = 16, w: Int = 5,
      maxSecondary: Int = 5): DataFrame = {
    val spark = queries.sparkSession
    val subj = subjects.select("read_id", "sequence1").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val index = SeedAligner.buildIndex(subj, k, w)
    val bcast = spark.sparkContext.broadcast(index)
    val rdd = queries.select("read_id", "sequence1").rdd.mapPartitions { rows =>
      val idx = bcast.value
      rows.flatMap { r =>
        val readId = r.getString(0)
        val seq = r.getString(1)
        val hits = SeedAligner.align(idx, seq, maxSecondary)
        if (hits.isEmpty)
          Iterator.single(Row(readId, 4, "*", 0L, 0L, 0.toShort, "*", "*", 0L, 0L,
            null, null))
        else hits.iterator.map { h =>
          val refLen = graft.kernel.SamCodec.cigarRefLen(h.cigar)
          Row(readId, h.flags, h.subjectName, h.position,
            h.position + refLen, h.mapq, h.cigar, "*", 0L, 0L,
            Long.box(h.score), Long.box(h.nm))
        }
      }
    }
    spark.createDataFrame(rdd, outputSchema)
  }

  /** Paired-end alignment: both mates aligned, concordant pairing
    * resolved per read (same subject, opposite strands), SAM pair
    * conventions filled in — flags 0x1 | 0x2(proper) | 0x40/0x80 |
    * 0x20(mate reverse), mate_reference '=', mate_position, signed
    * template_length (reference: src/Minimap2Aligner.hpp:94-109 flag
    * calculus; exact minimap2 pairing score out of scope).
    */
  def alignMinimap2Paired(
      queries: DataFrame,
      subjects: DataFrame,
      k: Int = 16, w: Int = 5): DataFrame = {
    val spark = queries.sparkSession
    val subj = subjects.select("read_id", "sequence1").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val index = SeedAligner.buildIndex(subj, k, w)
    val bcast = spark.sparkContext.broadcast(index)
    val rdd = queries.select("read_id", "sequence1", "sequence2").rdd.mapPartitions { rows =>
      val idx = bcast.value
      rows.flatMap { r =>
        val readId = r.getString(0)
        val h1 = SeedAligner.align(idx, r.getString(1), maxSecondary = 0).headOption
        val h2 = SeedAligner.align(idx, r.getString(2), maxSecondary = 0).headOption
        (h1, h2) match {
          case (Some(a), Some(b)) =>
            val concordant = a.subjectName == b.subjectName &&
              ((a.flags ^ b.flags) & 0x10) != 0
            val proper = if (concordant) 0x2 else 0
            def row(self: SeedAligner.Hit, mate: SeedAligner.Hit, firstInPair: Boolean) = {
              val selfRefLen = graft.kernel.SamCodec.cigarRefLen(self.cigar)
              val mateRefLen = graft.kernel.SamCodec.cigarRefLen(mate.cigar)
              val sameRef = self.subjectName == mate.subjectName
              val tlen =
                if (!sameRef) 0L
                else {
                  val lo = math.min(self.position, mate.position)
                  val hi = math.max(self.position + selfRefLen, mate.position + mateRefLen)
                  val span = hi - lo
                  if (self.position <= mate.position) span else -span
                }
              val flags = 0x1 | proper | self.flags |
                (if (firstInPair) 0x40 else 0x80) |
                (if ((mate.flags & 0x10) != 0) 0x20 else 0)
              Row(readId, flags, self.subjectName, self.position,
                self.position + selfRefLen, self.mapq, self.cigar,
                if (sameRef) "=" else mate.subjectName, mate.position, tlen,
                Long.box(self.score), Long.box(self.nm))
            }
            Seq(row(a, b, firstInPair = true), row(b, a, firstInPair = false))
          case _ =>
            // one or both mates unmapped → unmapped pair rows
            Seq(Row(readId, 0x1 | 0x4 | 0x40, "*", 0L, 0L, 0.toShort, "*", "*", 0L, 0L, null, null),
              Row(readId, 0x1 | 0x4 | 0x80, "*", 0L, 0L, 0.toShort, "*", "*", 0L, 0L, null, null))
        }
      }
    }
    spark.createDataFrame(rdd, outputSchema)
  }

  /** save_minimap2_index-equivalent: persist the subjects relation so
    * shards can be rebuilt per task; returns the 1-row status relation.
    */
  def saveAlignerIndex(
      subjects: DataFrame, outputPath: String): DataFrame = {
    val spark = subjects.sparkSession
    subjects.select("read_id", "sequence1").write.mode("overwrite").parquet(outputPath)
    val n = spark.read.parquet(outputPath).count()
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(true, outputPath, n)), 1),
      StructType(Seq(
        StructField("success", BooleanType),
        StructField("index_path", StringType),
        StructField("num_subjects", LongType))))
  }

  /** Sharded alignment: one sub-job per shard — the shard's queries
    * (join on read_to_shard) against the shard's subject set (its own
    * broadcast index), results unioned. This is the reference's
    * thread-per-shard schedule (src/align_minimap2_sharded.cpp,
    * largest-first load balancing is delegated to Spark's scheduler);
    * no shard index ever coexists with another on an executor, so
    * memory stays bounded by the largest single shard.
    */
  def alignMinimap2Sharded(
      queries: DataFrame,
      shardDirectory: String,
      readToShard: DataFrame,
      k: Int = 16, w: Int = 5,
      maxSecondary: Int = 5): DataFrame = {
    val spark = queries.sparkSession
    val withShard = queries.select("read_id", "sequence1")
      .join(readToShard.select("read_id", "shard_name"), "read_id")
    val shards = withShard.select("shard_name").distinct()
      .collect().map(_.getString(0)).sorted
    shards.map { shard =>
      val subjects = spark.read.parquet(s"$shardDirectory/$shard.parquet")
      alignMinimap2(
        withShard.filter(col("shard_name") === shard).select("read_id", "sequence1"),
        subjects, k, w, maxSecondary)
    }.reduce(_ unionAll _)
      // unmapped reads are filtered in sharded mode (README.md:1332)
      .filter((col("flags").bitwiseAND(lit(4))) === 0)
  }

  /** align_bowtie2_sharded: same per-shard sub-job schedule as the
    * minimap2 variant, each shard running through the bowtie2 pipe
    * harness (reference: src/align_bowtie2_sharded.cpp — one
    * single-threaded bowtie2 process per shard). Gated on the binary
    * like alignBowtie2.
    */
  def alignBowtie2Sharded(
      queries: DataFrame,
      shardDirectory: String,
      readToShard: DataFrame): DataFrame = {
    val spark = queries.sparkSession
    val withShard = queries.select("read_id", "sequence1")
      .join(readToShard.select("read_id", "shard_name"), "read_id")
    val shards = withShard.select("shard_name").distinct()
      .collect().map(_.getString(0)).sorted
    shards.map { shard =>
      val subjects = spark.read.parquet(s"$shardDirectory/$shard.parquet")
      alignBowtie2(
        withShard.filter(col("shard_name") === shard).select("read_id", "sequence1"),
        subjects)
    }.reduce(_ unionAll _)
      .filter((col("flags").bitwiseAND(lit(4))) === 0)
  }

  /** align_bowtie2 harness: pipes FASTA/FASTQ through an external
    * bowtie2 process per partition (reference: src/Bowtie2Aligner.hpp
    * pipe-deadlock-avoidant design → ProcessBuilder + reader thread).
    * Errors when the binary is absent — probe with bowtie2_available()
    * (reference: src/align_bowtie2.cpp:257-259).
    */
  def alignBowtie2(
      queries: DataFrame,
      subjects: DataFrame): DataFrame = {
    val bt2 = graft.functions.MiintRegistry.bowtie2Binary("bowtie2")
      .getOrElse(throw new UnsupportedOperationException(
        "bowtie2 binary not found on PATH (bowtie2_available() = false)"))
    val bt2Build = graft.functions.MiintRegistry.bowtie2Binary("bowtie2-build")
      .getOrElse(throw new UnsupportedOperationException(
        "bowtie2-build binary not found on PATH"))
    val spark = queries.sparkSession
    // build temp index on the driver, pipe per partition
    val tmp = java.nio.file.Files.createTempDirectory("graft_bt2").toString
    val fasta = s"$tmp/subjects.fasta"
    Writers.copyFasta(subjects.select("read_id", "sequence1"), fasta)
    val rc = new ProcessBuilder(bt2Build, "-q", fasta, s"$tmp/index")
      .inheritIO().start().waitFor()
    require(rc == 0, s"bowtie2-build failed with exit code $rc")
    val rdd = queries.select("read_id", "sequence1").rdd.mapPartitions { rows =>
      val proc = new ProcessBuilder(bt2, "-x", s"$tmp/index", "-f", "-U", "-",
        "--quiet", "--no-head").redirectErrorStream(false).start()
      val writer = new java.io.PrintWriter(proc.getOutputStream)
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream))
      val out = new scala.collection.mutable.ArrayBuffer[Row]()
      // writer thread (bounded pipe deadlock avoidance)
      val t = new Thread(() => {
        rows.foreach { r =>
          writer.println(s">${r.getString(0)}"); writer.println(r.getString(1))
        }
        writer.close()
      })
      t.start()
      var line = reader.readLine()
      while (line != null) {
        val rec = graft.kernel.SamCodec.parseLine(line, includeSeqQual = false)
        out += Row(rec.readId, rec.flags, rec.reference, rec.position,
          rec.stopPosition, rec.mapq, rec.cigar, rec.mateReference,
          rec.matePosition, rec.templateLength,
          rec.tagAs.map(Long.box).orNull, rec.tagNm.map(Long.box).orNull)
        line = reader.readLine()
      }
      t.join()
      out.iterator
    }
    spark.createDataFrame(rdd, outputSchema)
  }
}
