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
