package graft.kernel

/** URL canonicalization for web-corpus curation — the normalize /
  * group-by-site primitives a Common-Crawl-scale pipeline runs before
  * URL-level dedup and per-domain caps (CCNet §2.1, RefinedWeb §3.1
  * both dedupe on a normalized URL and cap documents per domain).
  *
  * Pure JVM, regex-based (no java.net.URL: it throws on the malformed
  * tail of a real crawl; normalize degrades to identity instead), and
  * deterministic — the oracle re-derives expected outputs from the
  * generative URL formula, never from a second parser.
  */
object UrlKernel {

  private val CrLf = java.util.regex.Pattern.compile("\\r?\\n")

  private val UrlRe =
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\\?([^#]*))?(?:#.*)?$".r

  /** Query parameters that identify the click, not the content —
    * stripped during normalization (the standard tracking families).
    */
  private val TrackingParams = Set(
    "gclid", "fbclid", "msclkid", "ref", "mc_cid", "mc_eid", "igshid")
  private def isTracking(key: String): Boolean = {
    val k = key.toLowerCase
    k.startsWith("utm_") || TrackingParams.contains(k)
  }

  /** Country-code second-level suffixes under which the registrable
    * name sits one label deeper (a practical subset of the public
    * suffix list; unknown suffixes fall back to last-two-labels).
    */
  private val CcSld = Set(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
    "com.au", "net.au", "org.au", "co.jp", "or.jp", "ne.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
    "com.ar", "com.tr", "com.tw", "co.nz")

  /** Canonical form: lowercase scheme + host, default ports (:80 http,
    * :443 https) stripped, fragment dropped, tracking query params
    * removed (param order otherwise preserved), empty query dropped.
    * Path case and non-default ports are preserved. A string that
    * does not parse as scheme://authority... is returned unchanged
    * (crawl tails must not throw mid-pipeline).
    */
  def normalize(url: String): String = url match {
    case null => null
    case _ => url.trim match {
      case UrlRe(scheme, authority, path, query) =>
        val sch = scheme.toLowerCase
        val auth = authority.toLowerCase
        val colon = auth.lastIndexOf(':')
        val (host, port) =
          if (colon < 0) (auth, "")
          else (auth.substring(0, colon), auth.substring(colon))
        val normPort = port match {
          case ":80" if sch == "http" => ""
          case ":443" if sch == "https" => ""
          case p => p
        }
        val normQuery = Option(query).map { q =>
          q.split("&", -1).filter { kv =>
            kv.nonEmpty && !isTracking(kv.split("=", 2)(0))
          }.mkString("&")
        }.filter(_.nonEmpty).map("?" + _).getOrElse("")
        sch + "://" + host + normPort + path + normQuery
      case other => other
    }
  }

  /** Host part of a URL, lowercased, without port; null if the string
    * has no scheme://authority shape.
    */
  def host(url: String): String = url match {
    case null => null
    case _ => url.trim match {
      case UrlRe(_, authority, _, _) =>
        val auth = authority.toLowerCase
        val colon = auth.lastIndexOf(':')
        if (colon < 0) auth else auth.substring(0, colon)
      case _ => null
    }
  }

  /** Path part of a URL ("/" when empty); null when unparseable. */
  def path(url: String): String = url match {
    case null => null
    case _ => url.trim match {
      case UrlRe(_, _, p, _) => if (p == null || p.isEmpty) "/" else p
      case _ => null
    }
  }

  /** robots.txt rules applicable to `agent`: ordered (allow, prefix)
    * directives from every group whose User-agent matches `agent` or
    * `*` (RFC 9309 grouping: consecutive User-agent lines open one
    * group; comments stripped; empty Disallow = allow-all = no rule).
    * Wildcards/$ anchors are NOT interpreted (prefix-match subset —
    * the common case; documented).
    */
  def robotsRules(txt: String, agent: String): Array[(Boolean, String)] = {
    if (txt == null) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[(Boolean, String)]
    var applies = false
    var inAgentRun = false
    for (raw <- CrLf.split(txt)) { // compiled once (r14)
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        val i = line.indexOf(':')
        if (i > 0) {
          val k = line.substring(0, i).trim.toLowerCase
          val v = line.substring(i + 1).trim
          k match {
            case "user-agent" =>
              if (!inAgentRun) applies = false // a new group starts
              inAgentRun = true
              if (v == "*" || v.equalsIgnoreCase(agent)) applies = true
            case "allow" | "disallow" =>
              inAgentRun = false
              if (applies && v.nonEmpty) out += ((k == "allow", v))
            case _ => inAgentRun = false
          }
        }
      }
    }
    out.toArray
  }

  /** RFC 9309 decision: longest matching prefix wins; Allow wins a
    * length tie; no matching rule = allowed.
    */
  def robotsAllowed(rules: Array[(Boolean, String)], urlPath: String): Boolean = {
    if (urlPath == null) return true
    var bestLen = -1
    var bestAllow = true
    for ((allow, prefix) <- rules if urlPath.startsWith(prefix)) {
      if (prefix.length > bestLen ||
          (prefix.length == bestLen && allow && !bestAllow)) {
        bestLen = prefix.length
        bestAllow = allow
      }
    }
    bestAllow
  }

  /** Registrable domain of a host: the last two labels, or the last
    * three when the two-label suffix is a known ccSLD (shop.co.uk →
    * shop.co.uk, www.site.example.com → example.com). Hosts with
    * fewer labels come back unchanged.
    */
  def registeredDomain(hostName: String): String = {
    if (hostName == null) return null
    val labels = hostName.split("\\.", -1)
    if (labels.length <= 2) return hostName
    val lastTwo = labels(labels.length - 2) + "." + labels(labels.length - 1)
    val take = if (CcSld.contains(lastTwo)) 3 else 2
    if (labels.length <= take) hostName
    else labels.takeRight(take).mkString(".")
  }
}
