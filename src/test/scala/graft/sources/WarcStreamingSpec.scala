package graft.sources

import graft.SparkFixture
import graft.kernel.WarcCodec
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Micro-batch streaming over the warc source: crawl shards that
  * arrive between batches are ingested exactly once.
  */
class WarcStreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def writeWarc(path: String, uris: String*): Unit = {
    val out = new java.io.FileOutputStream(path)
    try WarcCodec.write(out, uris.iterator.map { u =>
      (Seq("WARC-Type" -> "resource", "WARC-Target-URI" -> u,
        "Content-Type" -> "text/plain"),
        s"payload of $u".getBytes("UTF-8"))
    }, gzipPerRecord = path.endsWith(".gz"))
    finally out.close()
  }

  test("readStream ingests newly arrived .warc.gz shards exactly once") {
    val dir = Files.createTempDirectory("graft_warc_stream").toString
    writeWarc(s"$dir/shard-0001.warc.gz", "u://a", "u://b")
    val query = spark.readStream.format("warc").load(s"$dir/*.warc.gz")
      .select("target_uri", "record_index")
      .writeStream.format("memory").queryName("graft_warc_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      query.processAllAvailable()
      def uris = spark.sql("SELECT target_uri FROM graft_warc_stream")
        .collect().map(_.getString(0)).sorted.toSeq
      assert(uris == Seq("u://a", "u://b"))
      writeWarc(s"$dir/shard-0002.warc.gz", "u://c")
      query.processAllAvailable()
      assert(uris == Seq("u://a", "u://b", "u://c"))
      // no new files → no duplicates
      query.processAllAvailable()
      assert(uris == Seq("u://a", "u://b", "u://c"))
    } finally query.stop()
  }
}
