package graft.ops

import graft.SparkFixture
import graft.kernel.UrlKernel
import org.scalatest.funsuite.AnyFunSuite

class UrlOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  // ---- kernel: normalize ----

  test("normalize lowercases scheme+host, strips default ports, keeps path case") {
    assert(UrlKernel.normalize("HTTP://WWW.Example.COM:80/A/B") ==
      "http://www.example.com/A/B")
    assert(UrlKernel.normalize("HTTPS://Host.Org:443/x") == "https://host.org/x")
    // non-default port preserved; :443 is only default for https
    assert(UrlKernel.normalize("http://h.com:8080/x") == "http://h.com:8080/x")
    assert(UrlKernel.normalize("http://h.com:443/x") == "http://h.com:443/x")
  }

  test("normalize drops fragments and tracking params, keeps the rest in order") {
    assert(UrlKernel.normalize("https://h.com/p?utm_source=a&id=7&fbclid=z#frag") ==
      "https://h.com/p?id=7")
    assert(UrlKernel.normalize("https://h.com/p?b=2&a=1") == "https://h.com/p?b=2&a=1")
    // query that empties out disappears entirely
    assert(UrlKernel.normalize("https://h.com/p?utm_campaign=x#s") == "https://h.com/p")
    assert(UrlKernel.normalize("https://h.com/p?UTM_Medium=x&Ref=y") == "https://h.com/p")
  }

  test("normalize degrades to identity on non-URL strings, null-safe") {
    assert(UrlKernel.normalize("not a url") == "not a url")
    assert(UrlKernel.normalize("mailto:a@b.c") == "mailto:a@b.c") // no ://
    assert(UrlKernel.normalize(null) == null)
    // empty path/query/fragment edge
    assert(UrlKernel.normalize("https://h.com") == "https://h.com")
    assert(UrlKernel.normalize("https://h.com?") == "https://h.com")
  }

  // ---- kernel: host + registrable domain ----

  test("host extracts lowercased host without port; null when unparseable") {
    assert(UrlKernel.host("HTTPS://A.B.C:8443/x?y#z") == "a.b.c")
    assert(UrlKernel.host("nonsense") == null)
    assert(UrlKernel.host(null) == null)
  }

  test("registeredDomain: last two labels, ccSLD-aware, short hosts unchanged") {
    assert(UrlKernel.registeredDomain("www.site5.example.com") == "example.com")
    assert(UrlKernel.registeredDomain("a.b.shop.co.uk") == "shop.co.uk")
    assert(UrlKernel.registeredDomain("shop.co.uk") == "shop.co.uk")
    assert(UrlKernel.registeredDomain("example.com") == "example.com")
    assert(UrlKernel.registeredDomain("localhost") == "localhost")
    assert(UrlKernel.registeredDomain(null) == null)
  }

  // ---- DataFrame ops ----

  test("capPerDomain keeps <= N per domain, deterministic md5 sample") {
    import spark.implicits._
    val df = (1L to 40L).map(i =>
      (i, s"https://site${i % 2}.example${i % 2}.com/p/$i"))
      .toDF("doc_id", "url").repartition(8)
    val out = UrlOps.capPerDomain(UrlOps.withUrlColumns(df, "url"), "doc_id", 3)
      .select("domain", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.groupBy(_._1).forall(_._2.length <= 3))
    assert(out.map(_._1).toSet == Set("example0.com", "example1.com"))
    // deterministic: a second run picks the identical sample
    val out2 = UrlOps.capPerDomain(UrlOps.withUrlColumns(df, "url"), "doc_id", 3)
      .select("domain", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.sortBy(identity).toSeq == out2.sortBy(identity).toSeq)
  }

  test("filterBlockedDomains drops blocked registrable domains incl. subdomains") {
    import spark.implicits._
    val df = Seq(
      (1L, "https://bad.example.com/x"),      // subdomain of blocked domain
      (2L, "https://example.com/y"),          // blocked exactly
      (3L, "https://good.other.org/z"))
      .toDF("doc_id", "url")
    val block = Seq("example.com").toDF("domain")
    val out = UrlOps.filterBlockedDomains(
        UrlOps.withUrlColumns(df, "url"), block)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(3L))
  }

  test("robotsRules: grouping, agent match, comments, empty Disallow") {
    import graft.kernel.UrlKernel.{robotsRules, robotsAllowed}
    val txt =
      """# header comment
        |User-agent: googlebot
        |User-agent: mybot
        |Disallow: /both   # trailing comment
        |
        |User-agent: *
        |Disallow: /a
        |Allow: /a/ok
        |Disallow:
        |
        |User-agent: other
        |Disallow: /
        |""".stripMargin
    // '*' agent: only the middle group applies; empty Disallow = no rule
    assert(robotsRules(txt, "anybot").toSeq ==
      Seq((false, "/a"), (true, "/a/ok")))
    // a named agent matches BOTH its consecutive-user-agent group and '*'
    assert(robotsRules(txt, "mybot").toSeq ==
      Seq((false, "/both"), (false, "/a"), (true, "/a/ok")))
    assert(robotsRules(txt, "other").toSeq ==
      Seq((false, "/a"), (true, "/a/ok"), (false, "/")))
    assert(robotsRules(null, "*").isEmpty)
  }

  test("robotsAllowed: longest match wins, Allow wins ties, no rule = allow") {
    import graft.kernel.UrlKernel.robotsAllowed
    val rules = Array((false, "/a"), (true, "/a/ok"), (false, "/a/ok/no"))
    assert(!robotsAllowed(rules, "/a/x"))
    assert(robotsAllowed(rules, "/a/ok/page"))
    assert(!robotsAllowed(rules, "/a/ok/no/deep"))
    assert(robotsAllowed(rules, "/elsewhere"))
    assert(robotsAllowed(Array.empty, "/a"))
    // Allow wins a same-length tie regardless of rule order
    assert(robotsAllowed(Array((false, "/t"), (true, "/t")), "/t/x"))
    assert(robotsAllowed(Array((true, "/t"), (false, "/t")), "/t/x"))
  }

  test("robotsFilter: hosts without a robots row are allowed") {
    import spark.implicits._
    val urls = Seq((1L, "https://a.org/private/x"), (2L, "https://b.org/private/x"))
      .toDF("doc_id", "url")
    val robots = Seq(("a.org", "User-agent: *\nDisallow: /private\n"))
      .toDF("host", "robots_txt")
    val out = UrlOps.robotsFilter(urls, "url", robots)
      .select("doc_id", "robots_allowed").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(out == Map(1L -> false, 2L -> true))
  }
}
