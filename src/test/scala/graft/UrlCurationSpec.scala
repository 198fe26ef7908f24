package graft

import graft.ops.UrlCuration
import org.apache.spark.sql.functions._

class UrlCurationSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlCuration.canonicalizeUrl(col("u")).as("c"))
      .as[String].collect().toSeq

  test("canonicalizeUrl normalizes scheme, host, port, query, fragment") {
    assert(canon("HTTPS://WWW.Example.COM:443/Path/X?b=2&utm_source=tw#frag")
      === Seq("https://example.com/Path/X?b=2"))
    assert(canon("http://example.com:80") === Seq("http://example.com/"))
    assert(canon("example.com/a") === Seq("http://example.com/a"),
      "missing scheme defaults to http")
    assert(canon("http://user:pw@Example.com./x") ===
      Seq("http://example.com/x"), "userinfo and trailing dot stripped")
    assert(canon("https://site.org:8443/a") ===
      Seq("https://site.org:8443/a"), "non-default ports survive")
    assert(canon("http://a.com/p?utm_campaign=x&fbclid=1&gclid=2") ===
      Seq("http://a.com/p"), "all-tracking query drops the '?' entirely")
    assert(canon("http://a.com/P?z=1&a=2") === Seq("http://a.com/P?z=1&a=2"),
      "path case and param order preserved")
  }

  test("registrableDomain handles eTLD+1, multi-suffix, bare, and IPv4") {
    val got = Seq("news.bbc.co.uk", "a.b.example.com", "example.com",
        "localhost", "10.1.2.3", "shop.site.com.au")
      .toDF("h").select(UrlCuration.registrableDomain(col("h")).as("d"))
      .as[String].collect().toSeq
    assert(got === Seq("bbc.co.uk", "example.com", "example.com",
      "localhost", "10.1.2.3", "site.com.au"))
  }

  test("gateByDomain blocks domains and caps docs per domain deterministically") {
    val docs = (1L to 20L).map { i =>
      val host = if (i <= 10) "big.com" else if (i <= 15) "spam.net"
                 else s"site$i.org"
      (i, s"https://www.$host/page/$i?utm_source=x")
    }.toDF("doc_id", "url")
    val got = UrlCuration.gateByDomain(docs, "url", "doc_id",
      blockedDomains = Seq("spam.net"), maxDocsPerDomain = 3)
    assert(got.columns.toSeq ===
      Seq("doc_id", "url", "url_canon", "domain"))
    val byDom = got.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byDom.contains("spam.net"))
    assert(byDom("big.com") === 3L, "hot domain capped")
    assert(byDom.size === 6, "big.com + 5 singleton sites")
    // deterministic: same input in another order -> same survivors
    val again = UrlCuration.gateByDomain(
        docs.orderBy(col("doc_id").desc).repartition(7), "url", "doc_id",
        blockedDomains = Seq("spam.net"), maxDocsPerDomain = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(again === got.select("doc_id").as[Long].collect().toSet)
  }

  test("domainReputationGate keeps good-domain docs, drops junk domains") {
    // good.com: 3/4 pass; bad.com: 1/4 pass; gate at 0.5 — note doc 7
    // passes on its own but dies with its domain, and doc 3 fails on its
    // own but survives on a good domain
    val docs = Seq(
      (0L, "https://good.com/a", true), (1L, "https://good.com/b", true),
      (2L, "https://good.com/c", true), (3L, "https://good.com/d", false),
      (4L, "https://bad.com/a", false), (5L, "https://bad.com/b", false),
      (6L, "https://bad.com/c", false), (7L, "https://bad.com/d", true)
    ).toDF("doc_id", "url", "pass")
    val got = UrlCuration.domainReputationGate(docs, "url", "pass", 0.5)
    val kept = got.select("doc_id").as[Long].collect().toSet
    assert(kept === Set(0L, 1L, 2L, 3L))
    val row = got.filter(col("doc_id") === 3L)
      .select("domain", "domain_rate", "domain_docs").collect().head
    assert(row.getString(0) === "good.com")
    assert(row.getDouble(1) === 0.75)
    assert(row.getLong(2) === 4L)
  }
}
