package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL/domain curation — the gate C4 (Raffel et al. 2020), CCNet
  * (Wenzek et al. 2020) and RefinedWeb (Penedo et al. 2023) all apply
  * before any text filter runs: canonicalize the document URL,
  * extract the registrable domain (eTLD+1), drop blocklisted domains,
  * and cap documents per domain so no single site dominates the corpus.
  * The reference engine has no URL surface (it is a feature store, not a
  * crawler pipeline); this family extends the curation operators the
  * same way the dedup/DSIR battery does.
  *
  * Everything here is native string/array expressions (regexp_replace /
  * regexp_extract / split / higher-order filters) — codegen'd
  * end-to-end, zero UDFs, and replayable verbatim in the DuckDB oracle
  * (RE2-compatible patterns only; no lookbehind, no backreferences).
  */
object UrlCuration {

  /** Canonical URL form:
    *  - scheme lowercased; missing scheme defaults to http
    *  - userinfo stripped; host lowercased; trailing dot, leading
    *    `www.`, and the scheme's default port (:80 / :443) stripped
    *  - empty path normalized to `/` (path case is preserved —
    *    paths are case-sensitive, hosts are not)
    *  - tracking parameters dropped (utm_*, fbclid, gclid, msclkid,
    *    ref, mc_cid, mc_eid), remaining query kept in original order
    *  - fragment dropped
    */
  def canonicalizeUrl(url: Column): Column = {
    val u = trim(url)
    val schemeRaw = regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    val hasScheme = schemeRaw =!= ""
    val scheme = when(hasScheme, lower(schemeRaw)).otherwise(lit("http"))
    val rest = when(hasScheme,
      regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")).otherwise(u)
    val authority = regexp_extract(rest, "^([^/?#]*)", 1)
    val tail = rest.substr(length(authority) + lit(1), lit(1 << 30))
    val host0 = lower(regexp_replace(authority, "^[^@]*@", ""))
    val host1 =
      when(scheme === "http", regexp_replace(host0, ":80$", ""))
        .when(scheme === "https", regexp_replace(host0, ":443$", ""))
        .otherwise(host0)
    val host = regexp_replace(regexp_replace(host1, "\\.$", ""), "^www\\.", "")
    val path0 = regexp_extract(tail, "^([^?#]*)", 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val queryRaw = regexp_extract(tail, "\\?([^#]*)", 1)
    val params = filter(split(queryRaw, "&"), p =>
      p =!= "" && !p.rlike(TrackingParamPattern))
    val query = array_join(params, "&")
    concat(scheme, lit("://"), host, path,
      when(query === "", lit("")).otherwise(concat(lit("?"), query)))
  }

  /** Shared Spark/DuckDB RE2 pattern for tracking query parameters. */
  val TrackingParamPattern =
    "^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref|mc_cid|mc_eid)="

  /** Host of a CANONICAL url (as produced by [[canonicalizeUrl]]),
    * port stripped — the domain-extraction input.
    */
  def hostOf(canonicalUrl: Column): Column =
    regexp_replace(
      regexp_extract(canonicalUrl, "^[a-z][a-z0-9+.-]*://([^/?#]*)", 1),
      ":[0-9]+$", "")

  /** Multi-label public suffixes recognized by [[registrableDomain]] —
    * a compact embedded subset of the public-suffix list (the full
    * Mozilla PSL is ~10k entries; these cover the common ccTLD
    * second-level registries). Extend here, and mirror the literal in
    * any SQL oracle.
    */
  val MultiSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "co.in", "co.nz", "com.br", "com.cn",
    "com.mx", "com.tr", "co.za", "com.sg", "com.hk")

  /** Registrable domain (eTLD+1) of a host: the last two labels, or the
    * last three when the trailing two are a recognized multi-label
    * public suffix ([[MultiSuffixes]]); IPv4 hosts pass through whole.
    * Row-local array algebra — no shuffle, no UDF.
    */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = array_join(slice(labels, -2, 2), ".")
    val last3 = array_join(slice(labels, -3, 3), ".")
    when(host.rlike("^[0-9.]+$"), host)
      .when(n <= 2, host)
      .when(last2.isin(MultiSuffixes: _*), last3)
      .otherwise(last2)
  }

  /** Domain-level corpus gate: canonicalize `urlCol`, derive the
    * registrable domain, drop rows whose domain is blocklisted, and keep
    * at most `maxDocsPerDomain` documents per domain — the keep choice
    * is the deterministic hash order of (canonical url, id), so the
    * same corpus always survives identically regardless of input order
    * or partitioning (the [[Sharding]] reproducibility contract).
    *
    * Output: every input column plus `url_canon` and `domain`.
    *
    * Scale shape: canonicalization and domain extraction ride the scan;
    * the blocklist is a literal IN-set (codegen) for a Seq, and the cap
    * is one window partitioned by DOMAIN — millions of partitions, each
    * a single site's documents. The heaviest real-world domain (~10^6
    * docs) sorts inside one task; if a corpus concentrates worse than
    * that, pre-aggregate per-domain counts and gate wholesale before
    * ranking the survivors.
    */
  def gateByDomain(docs: DataFrame, urlCol: String, idCol: String,
                   blockedDomains: Seq[String] = Nil,
                   maxDocsPerDomain: Int = Int.MaxValue): DataFrame = {
    require(maxDocsPerDomain > 0, "maxDocsPerDomain must be positive")
    val internal = Set("url_canon", "domain", "_rk")
    val clash = docs.columns.filter(internal.contains)
    require(clash.isEmpty,
      s"column(s) ${clash.mkString(", ")} collide with gate outputs")
    val withDom = docs
      .withColumn("url_canon", canonicalizeUrl(col(urlCol)))
      .withColumn("domain", registrableDomain(hostOf(col("url_canon"))))
    val allowed =
      if (blockedDomains.isEmpty) withDom
      else withDom.filter(!col("domain").isin(blockedDomains: _*))
    if (maxDocsPerDomain == Int.MaxValue) allowed
    else {
      val w = Window.partitionBy(col("domain")).orderBy(
        graft.functions.TextHash.charPolyHash(
          concat_ws(":", col("url_canon"), col(idCol).cast("string"))).asc,
        col(idCol).asc)
      allowed.withColumn("_rk", row_number().over(w))
        .filter(col("_rk") <= maxDocsPerDomain)
        .drop("_rk")
    }
  }

  /** Domain reputation gate (the C4/RefinedWeb "judge the site, not just
    * the page" move): score every registrable domain by the rate at which
    * its documents pass a caller-supplied boolean quality flag, and keep
    * only documents whose domain clears `minPassRate`. A page that would
    * pass on its own is dropped when it lives on a mostly-junk domain —
    * exactly the spam-farm signal page-local gates can't see.
    *
    * Output: every input column plus `domain`, `domain_rate` (pass rate
    * rounded to 4 decimals) and `domain_docs`.
    *
    * Scale shape: one map-side-combined groupBy produces the per-domain
    * table (|domains| rows — millions at worst, never corpus-sized); the
    * gate pre-filters that table to passing domains, so the join's build
    * side only shrinks further, and AQE broadcasts it. The corpus itself
    * shuffles once on `domain` only if the build side is genuinely too
    * big to broadcast.
    */
  def domainReputationGate(docs: DataFrame, urlCol: String,
                           passCol: String,
                           minPassRate: Double): DataFrame = {
    require(minPassRate >= 0.0 && minPassRate <= 1.0,
      "minPassRate must be in [0, 1]")
    val internal = Set("domain", "domain_rate", "domain_docs")
    val clash = docs.columns.filter(internal.contains)
    require(clash.isEmpty,
      s"column(s) ${clash.mkString(", ")} collide with gate outputs")
    val withDom = docs.withColumn("domain",
      registrableDomain(hostOf(canonicalizeUrl(col(urlCol)))))
    // rate = Σ(0/1 doubles) / n on both engines: exact sum, one division —
    // bit-identical to a SQL oracle's avg(CASE ...)
    val good = withDom.groupBy("domain")
      .agg(avg(when(col(passCol), 1.0).otherwise(0.0)).as("_rate"),
        count(lit(1)).as("domain_docs"))
      .filter(col("_rate") >= minPassRate)
    withDom.join(good, Seq("domain"))
      .withColumn("domain_rate", round(col("_rate"), 4))
      .drop("_rate")
  }
}
