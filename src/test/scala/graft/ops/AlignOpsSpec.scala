package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AlignOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def genome(seed: Int, len: Int): String = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(len)("ACGT"(rnd.nextInt(4))).mkString
  }

  test("alignMinimap2: exact substrings map back to their source at the right position") {
    import spark.implicits._
    val g1 = genome(21, 600)
    val g2 = genome(22, 600)
    val subjects = Seq(("ref1", g1), ("ref2", g2)).toDF("read_id", "sequence1")
    val queries = Seq(
      ("q1", g1.substring(100, 220)),
      ("q2", g2.substring(300, 420)),
      ("q3", "TTTT")) // too short → unmapped
      .toDF("read_id", "sequence1")
    val out = AlignOps.alignMinimap2(queries, subjects, k = 16, w = 5)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getString(6))).toSeq
    val primary = out.filter(h => (h._2 & 0x104) == 0).groupBy(_._1)
    assert(primary("q1").head._3 == "ref1" && primary("q1").head._4 == 101L)
    assert(primary("q2").head._3 == "ref2" && primary("q2").head._4 == 301L)
    assert(primary("q1").head._5 == "120=")
    // unmapped reads emit no rows (reference align_single skips them)
    assert(!out.exists(_._1 == "q3"))
  }

  test("alignMinimap2: full 21-col schema with tag and YT conventions") {
    import spark.implicits._
    val g = genome(40, 600)
    val subjects = Seq(("ref", g)).toDF("read_id", "sequence1")
    val out = AlignOps.alignMinimap2(
      Seq(("q", g.substring(100, 220))).toDF("read_id", "sequence1"),
      subjects, k = 16, w = 5)
    assert(out.schema.fieldNames.toSeq == AlignOps.outputSchema.fieldNames.toSeq)
    val r = out.collect().filter(r => (r.getInt(1) & 0x104) == 0).head
    assert(r.getAs[Long]("tag_as") == 120L)       // full-match score
    assert(r.getAs[Long]("tag_xs") == -1L)        // no second-best
    assert(r.getAs[Long]("tag_ys") == -1L && r.getAs[Long]("tag_xn") == -1L)
    assert(r.getAs[Long]("tag_xm") == 0L && r.getAs[Long]("tag_xo") == 0L
      && r.getAs[Long]("tag_xg") == 0L)
    assert(r.getAs[String]("tag_yt") == "UU")
    assert(r.getAs[String]("tag_md") == "120")    // all-match MD
    assert(r.getAs[String]("tag_sa") == "")
  }

  test("alignMinimap2: MD tag names the reference base at a mismatch") {
    import spark.implicits._
    val g = genome(41, 600)
    val refBase = g(150)
    val read = g.substring(100, 220).updated(50, if (refBase == 'A') 'C' else 'A')
    val out = AlignOps.alignMinimap2(
      Seq(("m", read)).toDF("read_id", "sequence1"),
      Seq(("ref", g)).toDF("read_id", "sequence1"), k = 16, w = 5)
      .collect().filter(r => (r.getInt(1) & 0x104) == 0).head
    assert(out.getAs[String]("tag_md") == s"50${refBase}69")
    assert(out.getAs[Long]("tag_xm") == 1L)
    assert(out.getAs[Long]("tag_nm") == 1L)
  }

  test("alignMinimap2: eqx=false collapses =/X runs to M") {
    import spark.implicits._
    val g = genome(42, 600)
    val read = g.substring(100, 220).updated(50, if (g(150) == 'A') 'C' else 'A')
    val out = AlignOps.alignMinimap2(
      Seq(("m", read)).toDF("read_id", "sequence1"),
      Seq(("ref", g)).toDF("read_id", "sequence1"),
      AlignOps.Minimap2Params(k = 16, w = 5, eqx = false))
      .collect().filter(r => (r.getInt(1) & 0x104) == 0).head
    assert(out.getString(6) == "120M")
    assert(out.getAs[Long]("tag_nm") == 1L) // stats from the =/X form
  }

  test("Minimap2Params presets resolve k/w bundles; unknown preset errors") {
    assert(AlignOps.Minimap2Params().resolvedK == 21) // 'sr' default
    assert(AlignOps.Minimap2Params().resolvedW == 11)
    assert(AlignOps.Minimap2Params(preset = "map-ont").resolvedK == 15)
    assert(AlignOps.Minimap2Params(preset = "map-ont", k = 17).resolvedK == 17)
    val e = intercept[IllegalArgumentException](
      AlignOps.Minimap2Params(preset = "bogus").resolvedK)
    assert(e.getMessage.contains("Unknown minimap2 preset"))
  }

  test("per_subject_database aligns each query against every subject independently") {
    import spark.implicits._
    val g1 = genome(43, 600)
    // g2 contains a copy of g1[100,300) — a read from there maps to both
    val g2base = genome(44, 600)
    val g2 = g2base.substring(0, 250) + g1.substring(100, 300) + g2base.substring(450)
    val subjects = Seq(("refA", g1), ("refB", g2)).toDF("read_id", "sequence1")
    val queries = Seq(("q", g1.substring(120, 260))).toDF("read_id", "sequence1")
    val params = AlignOps.Minimap2Params(k = 16, w = 5)
    // combined index: one primary, the other hit secondary
    val combined = AlignOps.alignMinimap2(queries, subjects, params)
      .collect().filter(r => (r.getInt(1) & 4) == 0)
    assert(combined.count(r => (r.getInt(1) & 0x100) == 0) == 1)
    // per-subject: a primary alignment per subject database
    val perSubj = AlignOps.alignMinimap2(queries, subjects, params,
      perSubjectDatabase = true)
      .collect().filter(r => (r.getInt(1) & 0x104) == 0)
    assert(perSubj.map(_.getString(2)).sorted.toSeq == Seq("refA", "refB"))
  }

  test("align from a saved index uses the baked-in k/w and rejects overrides") {
    import spark.implicits._
    val g = genome(45, 600)
    val subjects = Seq(("ref", g)).toDF("read_id", "sequence1")
    val dir = "/tmp/graft_aligner_index_kw"
    AlignOps.saveAlignerIndex(subjects, dir,
      AlignOps.Minimap2Params(k = 16, w = 5)).collect()
    val queries = Seq(("q", g.substring(200, 320))).toDF("read_id", "sequence1")
    val out = AlignOps.alignMinimap2FromIndex(queries, dir)
      .collect().filter(r => (r.getInt(1) & 0x104) == 0)
    assert(out.head.getString(2) == "ref" && out.head.getLong(3) == 201L)
    val e = intercept[IllegalArgumentException](
      AlignOps.alignMinimap2FromIndex(queries, dir,
        AlignOps.Minimap2Params(k = 21)))
    assert(e.getMessage.contains("baked into"))
    val e2 = intercept[IllegalArgumentException](
      AlignOps.alignMinimap2FromIndex(queries, "/tmp/definitely_not_an_index"))
    assert(e2.getMessage.contains("saved aligner index"))
  }

  test("paired alignment with one unmapped mate: mapped rows only, 0x8 flag, YT=UP") {
    import spark.implicits._
    val g = genome(46, 800)
    val subjects = Seq(("ref", g)).toDF("read_id", "sequence1")
    val out = AlignOps.alignMinimap2(
      Seq(("p", g.substring(100, 220), "TTTT"))
        .toDF("read_id", "sequence1", "sequence2"),
      subjects, AlignOps.Minimap2Params(k = 16, w = 5))
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(r => (r.getInt(1) & 0x40) != 0)) // only mate-1 rows
    val r = out.filter(r => (r.getInt(1) & 0x100) == 0).head
    assert((r.getInt(1) & 0x8) != 0 && (r.getInt(1) & 0x2) == 0)
    assert(r.getAs[String]("tag_yt") == "UP")
    assert(r.getString(7) == "*" && r.getLong(8) == 0L && r.getLong(9) == 0L)
  }

  test("alignMinimap2: reverse-complement reads get flag 0x10") {
    import spark.implicits._
    val g = genome(23, 600)
    val subjects = Seq(("ref", g)).toDF("read_id", "sequence1")
    val rcRead = graft.kernel.Rype.reverseComplementLenient(g.substring(200, 320))
    val out = AlignOps.alignMinimap2(
      Seq(("rc1", rcRead)).toDF("read_id", "sequence1"), subjects, k = 16, w = 5)
      .filter((col("flags").bitwiseAND(0x104)) === lit(0x0) || (col("flags").bitwiseAND(0x10)) =!= 0)
      .collect()
    val primary = out.filter(r => (r.getInt(1) & 0x104) == 0)
    assert(primary.nonEmpty)
    assert((primary.head.getInt(1) & 0x10) != 0)
    assert(primary.head.getLong(3) == 201L)
  }

  test("alignMinimap2: mutated read aligns with X ops and NM set") {
    import spark.implicits._
    val g = genome(24, 600)
    val read = g.substring(100, 220).updated(50, if (g(150) == 'A') 'C' else 'A')
    val subjects = Seq(("ref", g)).toDF("read_id", "sequence1")
    val out = AlignOps.alignMinimap2(
      Seq(("m1", read)).toDF("read_id", "sequence1"), subjects, k = 16, w = 5)
      .collect()
    val primary = out.filter(r => (r.getInt(1) & 0x104) == 0).head
    assert(primary.getString(6).contains("X"))
    assert(primary.getAs[Long]("tag_nm") == 1L)
  }

  test("sharded alignment: per-shard index loading") {
    import spark.implicits._
    val g1 = genome(25, 500)
    val g2 = genome(26, 500)
    Seq(("s1ref", g1)).toDF("read_id", "sequence1")
      .write.mode("overwrite").parquet("/tmp/graft_shards/shardA.parquet")
    Seq(("s2ref", g2)).toDF("read_id", "sequence1")
      .write.mode("overwrite").parquet("/tmp/graft_shards/shardB.parquet")
    val queries = Seq(
      ("r1", g1.substring(50, 170)), ("r2", g2.substring(50, 170)))
      .toDF("read_id", "sequence1")
    val readToShard = Seq(("r1", "shardA"), ("r2", "shardB")).toDF("read_id", "shard_name")
    val out = AlignOps.alignMinimap2Sharded(queries, "/tmp/graft_shards", readToShard,
      k = 16, w = 5)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out("r1") == "s1ref" && out("r2") == "s2ref")
  }

  test("paired-end alignment: proper-pair flags, mate fields, tlen") {
    import spark.implicits._
    val g = genome(30, 800)
    val subjects = Seq(("ref", g)).toDF("read_id", "sequence1")
    val r1 = g.substring(100, 220)
    val r2 = graft.kernel.Rype.reverseComplementLenient(g.substring(300, 420))
    val out = AlignOps.alignMinimap2Paired(
      Seq(("p1", r1, r2)).toDF("read_id", "sequence1", "sequence2"), subjects,
      k = 16, w = 5).collect()
      .filter(r => (r.getInt(1) & 0x100) == 0).sortBy(r => r.getInt(1) & 0x40)
    assert(out.length == 2)
    val first = out.find(r => (r.getInt(1) & 0x40) != 0).get
    val second = out.find(r => (r.getInt(1) & 0x80) != 0).get
    // both mapped, proper pair, opposite strands
    assert((first.getInt(1) & 0x1) != 0 && (first.getInt(1) & 0x2) != 0)
    assert((first.getInt(1) & 0x10) == 0 && (first.getInt(1) & 0x20) != 0)
    assert((second.getInt(1) & 0x10) != 0 && (second.getInt(1) & 0x20) == 0)
    assert(first.getString(7) == "=" && second.getString(7) == "=")
    assert(first.getLong(3) == 101L && second.getLong(3) == 301L)
    assert(first.getLong(8) == 301L && second.getLong(8) == 101L)
    assert(first.getLong(9) == 320L && second.getLong(9) == -320L)
  }

  test("paired-end classify merges mate minimizers") {
    import spark.implicits._
    val g = genome(31, 800)
    val index = RypeOps.buildIndex(
      Seq(("bucket", g)).toDF("bucket_name", "sequence1"), k = 16, w = 5)
    val paired = Seq(("pr", g.substring(0, 120),
      graft.kernel.Rype.reverseComplementLenient(g.substring(400, 520))))
      .toDF("read_id", "sequence1", "sequence2")
    val out = RypeOps.rypeClassify(index, paired, k = 16, w = 5, threshold = 0.5)
      .collect()
    assert(out.nonEmpty && out.head.getString(2) == "bucket")
    assert(out.head.getDouble(3) > 0.8)
  }

  test("saveAlignerIndex returns a status row") {
    import spark.implicits._
    val subjects = Seq(("ref", genome(27, 300))).toDF("read_id", "sequence1")
    val status = AlignOps.saveAlignerIndex(subjects, "/tmp/graft_aligner_index").head()
    assert(status.getBoolean(0) && status.getLong(2) == 1L)
  }

  test("alignBowtie2 errors clearly without the binary") {
    import spark.implicits._
    val df = Seq(("x", "ACGT")).toDF("read_id", "sequence1")
    if (!graft.functions.MiintRegistry.bowtie2Available()) {
      val e = intercept[UnsupportedOperationException](AlignOps.alignBowtie2(df, df))
      assert(e.getMessage.contains("bowtie2"))
    }
  }

  test("bowtie2 pipe harness: fake binaries exercise the full subprocess path") {
    import spark.implicits._
    // install fake bowtie2/bowtie2-build in a temp dir published via the
    // graft.bowtie2.dir override — never a system directory, and a real
    // bowtie2 on PATH is shadowed rather than assumed absent. The fake
    // aligner maps every FASTA read to ref1 pos 1 with a full-length
    // match so the harness's piping + SAM parse is what's under test,
    // not alignment quality.
    val bin = java.nio.file.Files.createTempDirectory("graft_fake_bt2").toFile
    def install(name: String, body: String): Unit = {
      val f = new java.io.File(bin, name)
      val w = new java.io.PrintWriter(f)
      try w.write(body) finally w.close()
      f.setExecutable(true)
    }
    install("bowtie2-build", "#!/bin/sh\nexit 0\n")
    install("bowtie2",
      """#!/bin/sh
        |# read FASTA from stdin: >id / seq pairs -> one SAM line each
        |while read -r hdr; do
        |  read -r seq
        |  id=${hdr#>}
        |  n=${#seq}
        |  printf '%s\t0\tref1\t1\t42\t%sM\t*\t0\t0\t*\t*\tAS:i:10\tNM:i:0\n' "$id" "$n"
        |done
        |""".stripMargin)
    System.setProperty("graft.bowtie2.dir", bin.getAbsolutePath)
    try {
      assert(graft.functions.MiintRegistry.bowtie2Available())
      val queries = Seq(("q1", "ACGTACGT"), ("q2", "TTTTACGTACGT"))
        .toDF("read_id", "sequence1")
      val subjects = Seq(("ref1", "ACGTACGTACGTACGT")).toDF("read_id", "sequence1")
      val out = AlignOps.alignBowtie2(queries, subjects)
        .select("read_id", "flags", "reference", "position", "cigar", "tag_as")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
          r.getLong(3), r.getString(4), r.getLong(5))).sortBy(_._1)
      assert(out.toSeq == Seq(
        ("q1", 0, "ref1", 1L, "8M", 10L),
        ("q2", 0, "ref1", 1L, "12M", 10L)))
    } finally {
      System.clearProperty("graft.bowtie2.dir")
      new java.io.File(bin, "bowtie2-build").delete()
      new java.io.File(bin, "bowtie2").delete()
      bin.delete()
    }
  }

  /** Install fake bowtie2 binaries in a fresh temp dir and run `body`
    * with graft.bowtie2.dir pointed at them (always restored).
    */
  private def withFakeBt2(aligner: String)(body: => Unit): Unit = {
    val bin = java.nio.file.Files.createTempDirectory("graft_fake_bt2").toFile
    def install(name: String, text: String): Unit = {
      val f = new java.io.File(bin, name)
      val w = new java.io.PrintWriter(f)
      try w.write(text) finally w.close()
      f.setExecutable(true)
    }
    install("bowtie2-build", "#!/bin/sh\nexit 0\n")
    install("bowtie2", aligner)
    System.setProperty("graft.bowtie2.dir", bin.getAbsolutePath)
    try body
    finally {
      System.clearProperty("graft.bowtie2.dir")
      new java.io.File(bin, "bowtie2-build").delete()
      new java.io.File(bin, "bowtie2").delete()
      bin.delete()
    }
  }

  test("bowtie2 harness: quality column switches the batch to FASTQ (no -f)") {
    import spark.implicits._
    // the fake rejects -f (exit 9) and carries each record's quality
    // length back in AS — proving both the format decision and that
    // the quals actually crossed the pipe
    withFakeBt2(
      """#!/bin/sh
        |case " $* " in *" -f "*) echo "unexpected -f for FASTQ batch" >&2; exit 9;; esac
        |while read -r hdr; do
        |  read -r seq; read -r plus; read -r q
        |  id=${hdr#@}
        |  printf '%s\t0\tref1\t1\t42\t%sM\t*\t0\t0\t*\t*\tAS:i:%s\tNM:i:0\n' "$id" "${#seq}" "${#q}"
        |done
        |""".stripMargin) {
      val queries = Seq(("q1", "ACGTACGT", "IIIIIIII"), ("q2", "ACGT", "FFFF"))
        .toDF("read_id", "sequence1", "quality1")
      val subjects = Seq(("ref1", "ACGTACGTACGTACGT")).toDF("read_id", "sequence1")
      val out = AlignOps.alignBowtie2(queries, subjects)
        .select("read_id", "cigar", "tag_as").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sortBy(_._1)
      assert(out.toSeq == Seq(("q1", "8M", 8L), ("q2", "4M", 4L)))
    }
  }

  test("bowtie2 harness: sequence2 column streams interleaved pairs (--interleaved)") {
    import spark.implicits._
    withFakeBt2(
      """#!/bin/sh
        |case " $* " in *" --interleaved "*) ;; *) echo "missing --interleaved" >&2; exit 9;; esac
        |case " $* " in *" -f "*) ;; *) echo "expected -f for no-qual pairs" >&2; exit 9;; esac
        |while read -r h1; do
        |  read -r s1; read -r h2; read -r s2
        |  printf '%s\t99\tref1\t1\t42\t%sM\t=\t9\t12\t*\t*\tAS:i:10\tNM:i:0\n' "${h1#>}" "${#s1}"
        |  printf '%s\t147\tref1\t9\t42\t%sM\t=\t1\t-12\t*\t*\tAS:i:10\tNM:i:0\n' "${h2#>}" "${#s2}"
        |done
        |""".stripMargin) {
      val queries = Seq(("p1", "ACGTACGT", "TTGGCCAA")).toDF("read_id", "sequence1", "sequence2")
      val subjects = Seq(("ref1", "ACGTACGTACGTACGTACGT")).toDF("read_id", "sequence1")
      val out = AlignOps.alignBowtie2(queries, subjects)
        .select("read_id", "flags", "position", "mate_reference", "template_length")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
          r.getString(3), r.getLong(4))).sortBy(_._2)
      assert(out.toSeq == Seq(
        ("p1/1", 99, 1L, "=", 12L),
        ("p1/2", 147, 9L, "=", -12L)))
    }
  }

  test("real bowtie2 conformance (gated: runs only with a genuine binary on PATH)") {
    // r10/r11 advice: the fake-binary specs deliberately SHADOW any
    // real bowtie2 — the day the environment gains one, this test
    // certifies the true pipe path end-to-end (align_bowtie2.cpp
    // semantics: index build, FASTA single-end, FASTQ-if-quals,
    // interleaved pairs). assume() cancels cleanly when absent.
    assume(sys.props.get("graft.bowtie2.dir").isEmpty,
      "bowtie2 dir override active — not a PATH binary")
    assume(graft.functions.MiintRegistry.bowtie2Available(),
      "no bowtie2 on PATH — conformance test skipped")
    import spark.implicits._
    val g = genome(73, 1200)
    val subjects = Seq(("ref1", g)).toDF("read_id", "sequence1")

    // single-end FASTA (no quality column → -f path)
    val se = Seq(("s1", g.substring(100, 250)), ("s2", g.substring(600, 750)))
      .toDF("read_id", "sequence1")
    val seOut = AlignOps.alignBowtie2(se, subjects)
      .select("read_id", "flags", "reference", "position").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .filter(h => (h._2 & 0x104) == 0).sortBy(_._1)
    assert(seOut.map(h => (h._1, h._3, h._4)).toSeq ==
      Seq(("s1", "ref1", 101L), ("s2", "ref1", 601L)))

    // single-end FASTQ (quality column present and non-empty)
    val fq = Seq(("f1", g.substring(300, 450), "I" * 150))
      .toDF("read_id", "sequence1", "quality1")
    val fqOut = AlignOps.alignBowtie2(fq, subjects)
      .select("read_id", "flags", "position").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .filter(h => (h._2 & 0x104) == 0)
    assert(fqOut.toSeq == Seq(("f1", 0, 301L)))

    // paired interleaved: R2 is the reverse complement of a downstream
    // slice → a proper pair (0x2), mates on '=', opposite strands
    val r2 = graft.kernel.Rype.reverseComplementLenient(g.substring(500, 650))
    val pe = Seq(("p1", g.substring(100, 250), r2))
      .toDF("read_id", "sequence1", "sequence2")
    val peOut = AlignOps.alignBowtie2(pe, subjects)
      .select("read_id", "flags", "position", "mate_reference").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getString(3)))
      .filter(h => (h._2 & 0x104) == 0).sortBy(_._3)
    assert(peOut.length == 2)
    val first = peOut.find(h => (h._2 & 0x40) != 0).get
    val second = peOut.find(h => (h._2 & 0x80) != 0).get
    assert((first._2 & 0x1) != 0 && (first._2 & 0x2) != 0)
    assert(first._3 == 101L && second._3 == 501L)
    assert(first._4 == "=" && second._4 == "=")
    assert((first._2 & 0x10) == 0 && (second._2 & 0x10) != 0)
  }
}
