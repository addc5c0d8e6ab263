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

  test("missing XML fields become NULLs, not errors") {
    object Sparse extends Ncbi.Fetcher {
      def fetch(a: String, e: String) = "<GBSet><GBSeq></GBSeq></GBSet>"
    }
    val r = Ncbi.readNcbi(spark, Seq("X1"), Sparse).collect()(0)
    assert(r.getString(0) == "X1" && (1 to 7).forall(r.isNullAt))
  }
}
