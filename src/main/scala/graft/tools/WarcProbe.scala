package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the warc source: export an amplified documents
  * corpus as sharded per-record-gzip WARC files (the Common Crawl
  * shape), then measure (a) raw scan+count, (b) scan → html_to_text →
  * token-count aggregate — the first stage of a real crawl ingest.
  * Not part of the driver contract; SCALE.md records the numbers.
  */
object WarcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = args.lift(0).map(_.toInt).getOrElse(10) // amplification
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = new java.io.File(sys.props("java.io.tmpdir"), s"graft_warcprobe_x$n")
    if (!new java.io.File(dir, "_done").exists()) {
      dir.mkdirs()
      val docs = Amplify.documents(
        spark.read.parquet(s"$sfDir/documents.parquet").repartition(32), n)
        .select(
          concat(lit("https://example.org/doc/"), col("doc_id")).as("target_uri"),
          lit("response").as("warc_type"),
          lit("application/http;msgtype=response").as("content_type"),
          encode(concat(
            lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html><body><h1>Doc "),
            col("doc_id"), lit("</h1><p>"), col("text"), lit("</p></body></html>")),
            "UTF-8").as("payload"))
      val t0 = System.nanoTime()
      graft.ops.Writers.copyWarcSharded(docs, dir.getAbsolutePath + "/part-{SHARD}.warc.gz")
      println(f"[warcprobe] export: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      new java.io.FileOutputStream(new java.io.File(dir, "_done")).close()
    }
    val files = dir.listFiles().filter(_.getName.endsWith(".warc.gz"))
    println(f"[warcprobe] ${files.length} files, ${files.map(_.length()).sum / 1e6}%.1f MB gz")

    def time(name: String)(f: => Any): Unit = {
      f
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[warcprobe] $name: min=${runs.min}%.2f s")
    }
    val w = spark.read.format("warc").load(dir.getAbsolutePath + "/part-*.warc.gz")
    time("scan_count")(w.count())
    time("scan_extract_tokens") {
      w.select(graft.ops.Html.htmlToText(decode(col("payload"), "UTF-8")).as("t"))
        .select(size(split(col("t"), " ")).as("nt"))
        .agg(sum("nt"), count(lit(1))).collect()
    }
    spark.stop()
  }
}
