package graft.ops

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** read_ncbi through the injectable fetch boundary (zero-egress env):
  * a canned GenBank-XML fetcher exercises the real parse + schema.
  */
class NcbiSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private object CannedFetcher extends Ncbi.Fetcher {
    def fetch(accession: String, endpoint: String): String =
      s"""<GBSet><GBSeq>
         |  <GBSeq_definition>Test organism 16S ribosomal RNA</GBSeq_definition>
         |  <GBSeq_organism>Escherichia coli</GBSeq_organism>
         |  <GBSeq_taxid>562</GBSeq_taxid>
         |  <GBSeq_length>1542</GBSeq_length>
         |  <GBSeq_moltype>rRNA</GBSeq_moltype>
         |  <GBSeq_topology>linear</GBSeq_topology>
         |  <GBSeq_update-date>2021-06-21</GBSeq_update-date>
         |</GBSeq></GBSet>""".stripMargin
  }

  test("readNcbi parses canned GenBank XML into the 8-col schema") {
    val df = Ncbi.readNcbi(spark, Seq("NR_000001", "NR_000002"), CannedFetcher)
    assert(df.schema.fieldNames.toSeq == Seq("accession", "title", "organism",
      "taxonomy_id", "length", "molecule_type", "topology", "update_date"))
    val rows = df.collect().sortBy(_.getString(0))
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "NR_000001")
    assert(rows(0).getString(1) == "Test organism 16S ribosomal RNA")
    assert(rows(0).getString(2) == "Escherichia coli")
    assert(rows(0).getLong(3) == 562L && rows(0).getLong(4) == 1542L)
    assert(rows(0).getString(5) == "rRNA" && rows(0).getString(6) == "linear")
    assert(rows(0).getDate(7).toString == "2021-06-21")
  }

  test("default fetcher refuses with a clear zero-egress error") {
    val e = intercept[UnsupportedOperationException](
      Ncbi.readNcbi(spark, Seq("NR_000001")).collect())
    assert(e.getMessage.contains("network egress"))
  }

  test("readNcbiFasta parses canned FASTA into the 7-col sequence schema") {
    object F extends Ncbi.Fetcher {
      def fetch(a: String, e: String) =
        ">NR_1.1 Escherichia coli 16S\nACGTACGT\nTTTT\n>NR_2.1|second record\nGGGG\n"
    }
    val rows = Ncbi.readNcbiFasta(spark, Seq("NR_1"), F).collect()
    assert(rows.length == 2)
    // 0-based running index (read_ncbi_fasta.cpp post-increments from 0)
    assert(rows(0).getLong(0) == 0L && rows(0).getString(1) == "NR_1.1")
    assert(rows(1).getLong(0) == 1L)
    assert(rows(0).getString(2) == "Escherichia coli 16S")
    assert(rows(0).getString(3) == "ACGTACGTTTTT")
    assert(rows(0).isNullAt(4) && rows(0).isNullAt(5) && rows(0).isNullAt(6))
    assert(rows(1).getString(1) == "NR_2.1" && rows(1).getString(2) == "second record")
  }

  test("readNcbiAnnotation parses a feature table; complement and codon_start") {
    object F extends Ncbi.Fetcher {
      def fetch(a: String, e: String) =
        ">Feature ref|X1|\n" +
          "100\t200\tgene\n\t\t\tgene\tabcD\n" +
          "300\t250\tCDS\n\t\t\tcodon_start\t2\n\t\t\tproduct\twidget\n" +
          "400\t500\tCDS\n"
    }
    val rows = Ncbi.readNcbiAnnotation(spark, Seq("X1"), F).collect()
    assert(rows.length == 3)
    assert(rows(0).getString(0) == "X1" && rows(0).getString(2) == "gene")
    assert(rows(0).getInt(3) == 100 && rows(0).getInt(4) == 200)
    assert(rows(0).getString(6) == "+" && rows(0).isNullAt(7))
    assert(rows(0).getMap[String, String](8) == Map("gene" -> "abcD"))
    // complement run (stop before start) → '-' strand, outer bounds
    assert(rows(1).getString(2) == "CDS")
    assert(rows(1).getInt(3) == 250 && rows(1).getInt(4) == 300)
    assert(rows(1).getString(6) == "-")
    assert(rows(1).getInt(7) == 2) // codon_start 2 → phase 2 (ncbi_parser.cpp:489)
    assert(rows(1).getMap[String, String](8)("product") == "widget")
    // CDS without codon_start defaults to phase 0 (ncbi_parser.cpp:541)
    assert(rows(2).getString(2) == "CDS" && rows(2).getInt(7) == 0)
  }

  test("missing XML fields become NULLs, not errors") {
    object Sparse extends Ncbi.Fetcher {
      def fetch(a: String, e: String) = "<GBSet><GBSeq></GBSeq></GBSet>"
    }
    val r = Ncbi.readNcbi(spark, Seq("X1"), Sparse).collect()(0)
    assert(r.getString(0) == "X1" && (1 to 7).forall(r.isNullAt))
  }
}
