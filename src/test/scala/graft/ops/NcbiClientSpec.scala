package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import NcbiClient.{HttpResponse, HttpTransport}

/** Recorded-cassette tests for the NCBI HTTP client: canned
  * status+body responses travel through the REAL rate-limit /
  * backoff / URL-building code (reference: src/ncbi_client.cpp);
  * only the socket (HttpTransport.get) and the clock are faked, so
  * the untested surface shrinks to the JDK socket itself.
  */
class NcbiClientSpec extends AnyFunSuite {

  /** Scripted transport: plays back a fixed response list and records
    * every (url, headers) it was asked for.
    */
  final class Cassette(responses: HttpResponse*) extends HttpTransport {
    val requests = scala.collection.mutable.ArrayBuffer.empty[(String, Map[String, String])]
    private var i = 0
    def get(url: String, headers: Map[String, String]): HttpResponse = {
      requests += ((url, headers))
      val r = responses(math.min(i, responses.length - 1)); i += 1; r
    }
  }

  /** Virtual clock: sleeps advance simulated time instantly and are
    * recorded for assertion.
    */
  final class VClock {
    var nanos = 5000000000L // arbitrary epoch
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    def sleepMs(ms: Long): Unit = { sleeps += ms; nanos += ms * 1000000L }
    def now(): Long = nanos
  }

  private def client(cassette: Cassette, apiKey: String = "",
      clock: VClock = new VClock) =
    new NcbiClient(cassette, apiKey, clock.sleepMs, clock.now _)

  test("efetch URL shape matches the reference, no api_key") {
    val c = new Cassette(HttpResponse(200, "<GBSet/>"))
    assert(client(c).fetchGenBankXml("NC_000913.3") === "<GBSet/>")
    assert(c.requests.head._1 ===
      "https://eutils.ncbi.nlm.nih.gov/entrez/eutils/efetch.fcgi?db=nuccore&id=NC_000913.3&rettype=gb&retmode=xml")
    assert(c.requests.head._2.isEmpty) // E-utilities: no api-key header
  }

  test("api_key travels as a query param for E-utilities, a header for Datasets") {
    val c = new Cassette(HttpResponse(200, "ok"), HttpResponse(200, "report"))
    val cl = client(c, apiKey = "SECRET")
    cl.fetchFasta("U00096")
    cl.fetchAssemblyReport("GCF_000005845.2")
    assert(c.requests(0)._1.endsWith("&rettype=fasta&retmode=text&api_key=SECRET"))
    assert(c.requests(0)._2.isEmpty)
    assert(c.requests(1)._1 ===
      "https://api.ncbi.nlm.nih.gov/datasets/v2/genome/accession/GCF_000005845.2/dataset_report")
    assert(c.requests(1)._2 === Map("api-key" -> "SECRET"))
  }

  test("429 retries with 1s/2s/4s exponential backoff, then succeeds") {
    val c = new Cassette(HttpResponse(429, ""), HttpResponse(429, ""),
      HttpResponse(429, ""), HttpResponse(200, "finally"))
    val clock = new VClock
    assert(client(c, clock = clock).fetchFeatureTable("X") === "finally")
    assert(c.requests.size === 4)
    // backoff sleeps exactly 1000, 2000, 4000 (ncbi_client.cpp:56-68)
    assert(clock.sleeps.toSeq === Seq(1000L, 2000L, 4000L))
  }

  test("retryable statuses are exactly 429/500/502/503") {
    assert(Seq(429, 500, 502, 503).forall(NcbiClient.isRetryableStatus))
    assert(Seq(200, 301, 400, 401, 403, 404, 501, 504).forall(s => !NcbiClient.isRetryableStatus(s)))
  }

  test("non-retryable 404 throws immediately with the URL in the message") {
    val c = new Cassette(HttpResponse(404, "not found"))
    val e = intercept[java.io.IOException](client(c).fetchGenBankXml("BOGUS"))
    assert(e.getMessage.contains("HTTP 404"))
    assert(e.getMessage.contains("id=BOGUS"))
    assert(c.requests.size === 1)
  }

  test("transport-level failure (no HTTP status) does not retry") {
    val c = new Cassette(HttpResponse(0, "", Some("connection refused")))
    val clock = new VClock
    val e = intercept[java.io.IOException](
      client(c, clock = clock).fetchFasta("X"))
    assert(e.getMessage.contains("connection refused"))
    assert(c.requests.size === 1)
    assert(clock.sleeps.isEmpty)
  }

  test("exhausting MAX_RETRIES on persistent 503 throws after 4 attempts") {
    val c = new Cassette(HttpResponse(503, "busy"))
    val clock = new VClock
    val e = intercept[java.io.IOException](
      client(c, clock = clock).fetchGenBankXml("X"))
    assert(e.getMessage.contains("HTTP 503"))
    assert(c.requests.size === 4) // initial + MAX_RETRIES
    assert(clock.sleeps.toSeq === Seq(1000L, 2000L, 4000L))
  }

  test("rate limit: 3 req/s without key — back-to-back requests wait ~333ms") {
    val c = new Cassette(HttpResponse(200, "a"))
    val clock = new VClock
    val cl = client(c, clock = clock)
    cl.fetchFasta("A") // first request: primed a full interval in the past, no wait
    cl.fetchFasta("B")
    cl.fetchFasta("C")
    // two rate-limit waits of minInterval (333ms) since virtual time
    // only advances via sleeps
    assert(clock.sleeps.toSeq === Seq(333L, 333L))
  }

  test("rate limit: 10 req/s with key — interval drops to 100ms") {
    val c = new Cassette(HttpResponse(200, "a"))
    val clock = new VClock
    val cl = client(c, apiKey = "K", clock = clock)
    cl.fetchFasta("A"); cl.fetchFasta("B")
    assert(clock.sleeps.toSeq === Seq(100L))
  }

  test("rate limit waits only the remaining interval after elapsed work") {
    val c = new Cassette(HttpResponse(200, "a"))
    val clock = new VClock
    val cl = client(c, clock = clock)
    cl.fetchFasta("A")
    clock.nanos += 200L * 1000000L // 200ms of other work elapses
    cl.fetchFasta("B")
    assert(clock.sleeps.toSeq === Seq(133L)) // 333 - 200
  }

  test("cassette-to-parse integration: canned XML through client INTO readNcbi") {
    val xml =
      """<GBSet><GBSeq><GBSeq_definition>Escherichia coli str. K-12</GBSeq_definition>
        |<GBSeq_organism>Escherichia coli</GBSeq_organism>
        |<GBSeq_taxid>511145</GBSeq_taxid><GBSeq_length>4641652</GBSeq_length>
        |<GBSeq_moltype>DNA</GBSeq_moltype><GBSeq_topology>circular</GBSeq_topology>
        |<GBSeq_update-date>2024-01-15</GBSeq_update-date></GBSeq></GBSet>""".stripMargin
    val c = new Cassette(HttpResponse(200, xml))
    val row = Ncbi.parseMetadata("NC_000913.3",
      client(c).fetcher.fetch("NC_000913.3", "efetch"))
    assert(row.getString(1) === "Escherichia coli str. K-12")
    assert(row.getLong(3) === 511145L)
    assert(row.getString(6) === "circular")
  }
}
