package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** read_ncbi / read_ncbi_fasta / read_ncbi_annotation — interface +
  * stub (reference: src/read_ncbi*.cpp, src/ncbi_client.cpp).
  *
  * The reference fetches from NCBI E-utilities with rate limiting
  * (3 req/s, 10 with api_key) and exponential backoff on 429/5xx.
  * This environment has ZERO network egress (SURVEY §7.4), so the
  * fetch is an injectable interface: production would plug a
  * java.net.http client honoring the same rate limits; tests plug a
  * canned fetcher. Schemas and the driver-side (forced single-thread,
  * reference read_ncbi.hpp:33-35) execution shape are real.
  */
object Ncbi {

  /** Injectable fetch boundary (accession → GenBank XML/FASTA text). */
  trait Fetcher {
    def fetch(accession: String, endpoint: String): String
  }

  /** Default fetcher for the zero-egress environment. */
  object UnavailableFetcher extends Fetcher {
    def fetch(accession: String, endpoint: String): String =
      throw new UnsupportedOperationException(
        "NCBI E-utilities fetch requires network egress; inject a Fetcher")
  }

  val metadataSchema: StructType = StructType(Seq(
    StructField("accession", StringType), StructField("title", StringType),
    StructField("organism", StringType), StructField("taxonomy_id", LongType),
    StructField("length", LongType), StructField("molecule_type", StringType),
    StructField("topology", StringType), StructField("update_date", DateType)))

  /** read_ncbi(accession): metadata relation (driver-side fetch —
    * single-threaded by construction, matching the reference's forced
    * MaxThreads=1 rate-limit posture).
    */
  def readNcbi(spark: SparkSession, accessions: Seq[String],
      fetcher: Fetcher = UnavailableFetcher): DataFrame = {
    val rows = accessions.map { acc =>
      val xml = fetcher.fetch(acc, "efetch")
      parseMetadata(acc, xml)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), metadataSchema)
  }

  val sequenceSchema: StructType = StructType(Seq(
    StructField("sequence_index", LongType), StructField("read_id", StringType),
    StructField("comment", StringType), StructField("sequence1", StringType),
    StructField("sequence2", StringType),
    StructField("qual1", ArrayType(ShortType)),
    StructField("qual2", ArrayType(ShortType))))

  /** read_ncbi_fasta(accessions): E-utilities FASTA fetch → the shared
    * 7-col sequence schema; pipe- or space-delimited header split into
    * read_id/comment (reference: src/read_ncbi_fasta.cpp).
    */
  def readNcbiFasta(spark: SparkSession, accessions: Seq[String],
      fetcher: Fetcher = UnavailableFetcher): DataFrame = {
    val rows = accessions.flatMap { acc =>
      parseFasta(fetcher.fetch(acc, "efetch_fasta"))
    }.zipWithIndex.map { case ((id, comment, seq), i) =>
      // 0-based running index (read_ncbi_fasta.cpp:31,163 post-increments
      // from 0) — intentionally differs from the fastx reader's per-file
      // 1-based convention.
      Row(i.toLong, id, comment.orNull, seq, null, null, null)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), sequenceSchema)
  }

  private[ops] def parseFasta(text: String): Seq[(String, Option[String], String)] = {
    val out = Seq.newBuilder[(String, Option[String], String)]
    var id: String = null; var comment: Option[String] = None
    val seq = new StringBuilder
    def flush(): Unit = if (id != null) { out += ((id, comment, seq.toString)); seq.clear() }
    for (line <- text.linesIterator) {
      if (line.startsWith(">")) {
        flush()
        val header = line.drop(1)
        // reference splits pipe-delimited headers; plain headers split
        // on the first space
        val (i, c) =
          if (header.contains('|')) {
            val parts = header.split("\\|", 2)
            (parts(0).trim, parts.lift(1).map(_.trim).filter(_.nonEmpty))
          } else {
            val sp = header.indexOf(' ')
            if (sp < 0) (header, None)
            else (header.take(sp), Some(header.drop(sp + 1)).filter(_.nonEmpty))
          }
        id = i; comment = c
      } else seq ++= line.trim
    }
    flush()
    out.result()
  }

  val annotationSchema: StructType = StructType(Seq(
    StructField("seqid", StringType), StructField("source", StringType),
    StructField("type", StringType), StructField("position", IntegerType),
    StructField("stop_position", IntegerType), StructField("score", DoubleType),
    StructField("strand", StringType), StructField("phase", IntegerType),
    StructField("attributes", MapType(StringType, StringType))))

  /** read_ncbi_annotation(accessions): INSDC feature-table fetch →
    * read_gff-shaped rows. complement()/join() locations collapse to
    * outer bounds with strand '-' for complement; `codon_start`
    * qualifier → phase (reference: src/read_ncbi_annotation.cpp).
    */
  def readNcbiAnnotation(spark: SparkSession, accessions: Seq[String],
      fetcher: Fetcher = UnavailableFetcher): DataFrame = {
    val rows = accessions.flatMap { acc =>
      parseFeatureTable(acc, fetcher.fetch(acc, "efetch_ft"))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), annotationSchema)
  }

  private[ops] def parseFeatureTable(acc: String, text: String): Seq[Row] = {
    final case class Feat(tpe: String, start: Int, stop: Int, strand: String,
        attrs: scala.collection.mutable.LinkedHashMap[String, String])
    val feats = Seq.newBuilder[Feat]
    var cur: Feat = null
    for (line <- text.linesIterator if line.nonEmpty) {
      val cols = line.split("\t", -1)
      if (!line.startsWith("\t") && cols.length >= 3 && cols(2).nonEmpty) {
        // location line: start \t stop \t feature-key; complement runs
        // stop-before-start in the ft format
        val (a, b) = (cols(0).replaceAll("[<>]", "").toInt,
          cols(1).replaceAll("[<>]", "").toInt)
        cur = Feat(cols(2), math.min(a, b), math.max(a, b),
          if (a <= b) "+" else "-",
          scala.collection.mutable.LinkedHashMap.empty)
        feats += cur
      } else if (cur != null && cols.length >= 5 && cols(3).nonEmpty) {
        cur.attrs(cols(3)) = if (cols.length > 4) cols(4) else ""
      }
    }
    feats.result().map { f =>
      // Phase applies to CDS only: default 0, codon_start 1→0 2→2 3→1
      // (ncbi_parser.cpp:483-495,540-545); all other types get NULL.
      val phase =
        if (f.tpe != "CDS") None
        else f.attrs.get("codon_start").flatMap(_.toIntOption) match {
          case Some(2) => Some(2)
          case Some(3) => Some(1)
          case _ => Some(0) // codon_start 1, absent, or unparsable
        }
      Row(acc, "ncbi", f.tpe, f.start, f.stop, null, f.strand,
        phase.map(Int.box).orNull, f.attrs.toMap)
    }
  }

  /** Minimal GenBank-XML field extraction (enough for the schema; the
    * reference's full parser is 552 lines of the same shape).
    */
  private[ops] def parseMetadata(acc: String, xml: String): Row = {
    def tag(name: String): Option[String] = {
      val m = s"(?s)<$name>(.*?)</$name>".r.findFirstMatchIn(xml)
      m.map(_.group(1).trim)
    }
    Row(acc,
      tag("GBSeq_definition").orNull,
      tag("GBSeq_organism").orNull,
      tag("GBSeq_taxid").map(_.toLong).map(Long.box).orNull,
      tag("GBSeq_length").map(_.toLong).map(Long.box).orNull,
      tag("GBSeq_moltype").orNull,
      tag("GBSeq_topology").orNull,
      tag("GBSeq_update-date").map(java.sql.Date.valueOf).orNull)
  }
}
