package graft.sources

import graft.SparkFixture
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Micro-batch streaming over the fastx source: files that arrive
  * between batches are picked up exactly once (lexicographic
  * watermark offset).
  */
class FastxStreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def write(path: String, recs: (String, String)*): Unit = {
    val sb = new StringBuilder
    for ((id, seq) <- recs)
      sb.append(s"@$id\n$seq\n+\n${"I" * seq.length}\n")
    Files.write(Paths.get(path), sb.toString.getBytes)
  }

  test("readStream picks up newly arrived fastq files exactly once") {
    val dir = Files.createTempDirectory("graft_fastx_stream").toString
    write(s"$dir/run0001.fastq", ("r1", "ACGT"), ("r2", "TTTT"))
    val stream = spark.readStream.format("fastx").load(s"$dir/*.fastq")
    val query = stream.select("read_id", "sequence1")
      .writeStream.format("memory").queryName("graft_fastx_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      query.processAllAvailable()
      def ids = spark.sql("SELECT read_id FROM graft_fastx_stream")
        .collect().map(_.getString(0)).sorted.toSeq
      assert(ids == Seq("r1", "r2"))
      // a new file arrives: next batch reads ONLY it
      write(s"$dir/run0002.fastq", ("r3", "GGGG"))
      query.processAllAvailable()
      assert(ids == Seq("r1", "r2", "r3"))
      // no new files → no duplicates
      query.processAllAvailable()
      assert(ids == Seq("r1", "r2", "r3"))
    } finally query.stop()
  }

  test("alignments readStream ingests newly arrived SAM files") {
    val dir = Files.createTempDirectory("graft_sam_stream").toString
    def sam(path: String, ids: String*): Unit =
      Files.write(Paths.get(path),
        ("@HD\tVN:1.6\n" + ids.map(id =>
          s"$id\t0\tref1\t100\t60\t4M\t*\t0\t0\tACGT\tIIII\n").mkString).getBytes)
    sam(s"$dir/run01.sam", "a1", "a2")
    val query = spark.readStream.format("alignments").load(s"$dir/*.sam")
      .select("read_id", "position")
      .writeStream.format("memory").queryName("graft_sam_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      query.processAllAvailable()
      def ids = spark.sql("SELECT read_id FROM graft_sam_stream")
        .collect().map(_.getString(0)).sorted.toSeq
      assert(ids == Seq("a1", "a2"))
      sam(s"$dir/run02.sam", "b1")
      query.processAllAvailable()
      assert(ids == Seq("a1", "a2", "b1"))
    } finally query.stop()
  }

  test("checkpoint restart resumes without re-reading committed files") {
    // exercises offset (de)serialization through Spark's OffsetSeqLog:
    // a multi-file snapshot must round-trip the line-based checkpoint
    val dir = Files.createTempDirectory("graft_fastx_ckpt").toString
    val ckpt = s"$dir/_checkpoint"
    val out = s"$dir/_out"
    write(s"$dir/run0001.fastq", ("r1", "ACGT"))
    write(s"$dir/run0002.fastq", ("r2", "TTTT"))
    def start() = spark.readStream.format("fastx").load(s"$dir/*.fastq")
      .select("read_id", "sequence1")
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt).option("path", out)
      .outputMode(OutputMode.Append()).start()
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    // new file arrives while the stream is DOWN
    write(s"$dir/run0003.fastq", ("r3", "GGGG"))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    val ids = spark.read.parquet(out).collect().map(_.getString(0)).sorted.toSeq
    assert(ids == Seq("r1", "r2", "r3")) // r1/r2 exactly once after restart
  }

  test("file-snapshot offsets replay deterministically") {
    // a committed (start, end] range must map to end.files − start.files
    // regardless of what exists on disk at replay time
    val a = FileSnapshotOffset(Seq("f1", "f2"))
    val b = FileSnapshotOffset.fromJson(a.json())
    assert(b == a)
    assert(FileSnapshotOffset.fromJson("") == FileSnapshotOffset(Seq.empty))
    val planned = b.files.filterNot(FileSnapshotOffset(Seq("f1")).files.toSet)
    assert(planned == Seq("f2"))
  }

  test("paired-end streaming is rejected with a clear error") {
    val dir = Files.createTempDirectory("graft_fastx_stream2").toString
    write(s"$dir/a.fastq", ("r1", "ACGT"))
    val e = intercept[Exception] {
      spark.readStream.format("fastx")
        .option("sequence2", s"$dir/a.fastq")
        .load(s"$dir/*.fastq")
        .writeStream.format("memory").queryName("graft_fastx_stream_err")
        .outputMode(OutputMode.Append()).start()
        .processAllAvailable()
    }
    def rootMsg(t: Throwable): String =
      (Option(t.getMessage) ++ Option(t.getCause).map(rootMsg)).mkString(" | ")
    assert(rootMsg(e).contains("paired-end"))
  }
}
