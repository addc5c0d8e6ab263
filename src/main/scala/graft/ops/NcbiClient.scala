package graft.ops

/** NCBI E-utilities / Datasets HTTP client — the real request path the
  * reference runs (reference: src/ncbi_client.cpp:9-115,
  * src/include/ncbi_client.hpp:29-38), re-expressed over an injectable
  * transport so the rate-limit / retry / URL-building logic is
  * testable in a zero-egress environment: tests plug a scripted
  * transport (canned status+body responses) and a virtual clock; only
  * the socket itself is faked.
  *
  * Semantics matched to the reference:
  *  - rate limit 3 req/s without an api_key, 10 req/s with one
  *    (ncbi_client.hpp:33-34), enforced as a minimum inter-request
  *    interval measured from the PREVIOUS request's send time
  *    (ncbi_client.cpp:17-32);
  *  - retry on HTTP 429/500/502/503 only (ncbi_client.cpp:34-38),
  *    at most 3 retries, sleeping 1000ms then doubling
  *    (ncbi_client.hpp:37-38, ncbi_client.cpp:56-69);
  *  - transport-level failures (no HTTP status at all) do NOT retry
  *    (ncbi_client.cpp:66 `!response->HasRequestError()`);
  *  - E-utilities URLs carry the api_key as a query parameter; the
  *    Datasets API carries it as an `api-key` header
  *    (ncbi_client.cpp:84-115).
  */
object NcbiClient {
  final case class HttpResponse(status: Int, body: String,
      requestError: Option[String] = None) {
    def success: Boolean = requestError.isEmpty && status >= 200 && status < 300
  }

  /** The socket boundary: one GET. Production = java.net.http;
    * cassette tests = scripted responses.
    */
  trait HttpTransport {
    def get(url: String, headers: Map[String, String]): HttpResponse
  }

  /** Production transport over the JDK HTTP client. Compiled and
    * type-checked here; never reachable in this zero-egress
    * environment (any call fails at connect), which is exactly the
    * env-gate documented in SURVEY §7.4.
    */
  object JdkTransport extends HttpTransport {
    private lazy val client = java.net.http.HttpClient.newBuilder()
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .connectTimeout(java.time.Duration.ofSeconds(30))
      .build()
    def get(url: String, headers: Map[String, String]): HttpResponse =
      try {
        var b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url)).GET()
        headers.foreach { case (k, v) => b = b.header(k, v) }
        val resp = client.send(b.build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        HttpResponse(resp.statusCode(), resp.body())
      } catch {
        case e: java.io.IOException =>
          HttpResponse(0, "", Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
      }
  }

  val EutilsBase = "https://eutils.ncbi.nlm.nih.gov/entrez/eutils"
  val DatasetsBase = "https://api.ncbi.nlm.nih.gov/datasets/v2"
  val RateLimitNoKey = 3.0
  val RateLimitWithKey = 10.0
  val MaxRetries = 3
  val InitialRetryDelayMs = 1000L

  def isRetryableStatus(status: Int): Boolean =
    status == 429 || status == 500 || status == 502 || status == 503
}

final class NcbiClient(
    transport: NcbiClient.HttpTransport,
    apiKey: String = "",
    // Injectable time so the cassette spec can assert the exact sleep
    // schedule without wall-clock waits. Production defaults are real.
    sleepMs: Long => Unit = Thread.sleep,
    nowNanos: () => Long = System.nanoTime) {
  import NcbiClient._

  def rateLimit: Double = if (apiKey.isEmpty) RateLimitNoKey else RateLimitWithKey

  // Initialized one full interval in the past so the first request
  // never waits (ncbi_client.cpp:10 `now - 1s`).
  private var lastRequestNanos: Long = nowNanos() - 1000000000L
  private val rateLock = new Object

  private def respectRateLimit(): Unit = rateLock.synchronized {
    val minIntervalMs = (1000.0 / rateLimit).toLong
    val elapsedMs = (nowNanos() - lastRequestNanos) / 1000000L
    if (elapsedMs < minIntervalMs) sleepMs(minIntervalMs - elapsedMs)
    lastRequestNanos = nowNanos()
  }

  /** GET with rate limiting and exponential-backoff retries
    * (ncbi_client.cpp:40-82). Rate limiting applies once per logical
    * request; the reference's retry loop re-enters Request() without
    * re-invoking RespectRateLimit, and the backoff sleeps dominate the
    * inter-request interval anyway.
    */
  def makeRequest(url: String, useApiKeyHeader: Boolean): String = {
    respectRateLimit()
    val headers =
      if (useApiKeyHeader && apiKey.nonEmpty) Map("api-key" -> apiKey)
      else Map.empty[String, String]
    var retryDelayMs = InitialRetryDelayMs
    var attempt = 0
    while (attempt <= MaxRetries) {
      val resp = transport.get(url, headers)
      if (resp.success) return resp.body
      if (attempt < MaxRetries && resp.requestError.isEmpty &&
          isRetryableStatus(resp.status)) {
        sleepMs(retryDelayMs)
        retryDelayMs *= 2
      } else {
        resp.requestError match {
          case Some(err) =>
            throw new java.io.IOException(s"NCBI request failed: $err (URL: $url)")
          case None =>
            throw new java.io.IOException(
              s"NCBI request failed with HTTP ${resp.status} (URL: $url)")
        }
      }
      attempt += 1
    }
    throw new java.io.IOException(
      s"NCBI request failed after $MaxRetries retries (URL: $url)")
  }

  private def keyParam: String = if (apiKey.isEmpty) "" else s"&api_key=$apiKey"

  /** reference: ncbi_client.cpp:84-91 */
  def fetchGenBankXml(accession: String): String =
    makeRequest(
      s"$EutilsBase/efetch.fcgi?db=nuccore&id=$accession&rettype=gb&retmode=xml$keyParam",
      useApiKeyHeader = false)

  /** reference: ncbi_client.cpp:93-100 */
  def fetchFasta(accession: String): String =
    makeRequest(
      s"$EutilsBase/efetch.fcgi?db=nuccore&id=$accession&rettype=fasta&retmode=text$keyParam",
      useApiKeyHeader = false)

  /** reference: ncbi_client.cpp:102-109 */
  def fetchFeatureTable(accession: String): String =
    makeRequest(
      s"$EutilsBase/efetch.fcgi?db=nuccore&id=$accession&rettype=ft&retmode=text$keyParam",
      useApiKeyHeader = false)

  /** reference: ncbi_client.cpp:111-115 (api_key travels as a header) */
  def fetchAssemblyReport(accession: String): String =
    makeRequest(s"$DatasetsBase/genome/accession/$accession/dataset_report",
      useApiKeyHeader = true)

  /** Fetcher adapter: routes the read_ncbi* endpoint names used by
    * `Ncbi` through this client, so `readNcbi(spark, accs,
    * new NcbiClient(JdkTransport).fetcher)` is the production wiring.
    */
  val fetcher: Ncbi.Fetcher = new Ncbi.Fetcher {
    def fetch(accession: String, endpoint: String): String = endpoint match {
      case "efetch" => fetchGenBankXml(accession)
      case "efetch_fasta" => fetchFasta(accession)
      case "efetch_ft" => fetchFeatureTable(accession)
      case other => throw new IllegalArgumentException(s"unknown endpoint: $other")
    }
  }
}
