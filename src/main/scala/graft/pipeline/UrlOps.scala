package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** URL canonicalization and per-domain corpus shaping — the
  * provenance stages of web-corpus pipelines (C4/RefinedWeb-style URL
  * dedup keys, Dolma-style per-domain caps): normalize messy crawl
  * URLs to a stable key, roll them up to registered domains, and cap
  * how many documents any one domain contributes.
  *
  * Everything in [[normalizeUrl]]/[[registeredDomain]] is a pure
  * per-row projection over codegen'd natives (`parse_url`,
  * `regexp_replace`, `split`) — zero shuffle, so it composes into any
  * scan. [[capPerDomain]] is the salted two-level top-k the search
  * paths use (pre-prune per (domain, task-salt), then the final
  * per-domain window), so a mega-domain never funnels through one
  * reducer unbounded.
  */
object UrlOps {

  /** Canonical URL: lowercased scheme+host, default ports stripped,
    * fragment stripped, tracking params (utm_*, gclid, fbclid, ref)
    * removed, trailing path slashes stripped (the path itself stays
    * case-sensitive). Null-safe: unparseable URLs (no scheme/host)
    * return NULL so callers can quarantine them.
    */
  def normalizeUrl(url: Column): Column = {
    val proto = lower(try_parse_url(url, lit("PROTOCOL")))
    val host = lower(try_parse_url(url, lit("HOST")))
    val authority = try_parse_url(url, lit("AUTHORITY"))
    val port = regexp_extract(authority, ":(\\d+)$", 1)
    val keepPort = port =!= "" &&
      !((proto === "http" && port === "80") ||
        (proto === "https" && port === "443"))
    val path = regexp_replace(
      coalesce(try_parse_url(url, lit("PATH")), lit("")), "/+$", "")
    val q0 = coalesce(try_parse_url(url, lit("QUERY")), lit(""))
    // drop tracking params, then collapse the dangling separators
    val q1 = regexp_replace(q0,
      "(?i)(?:^|&)(?:utm_[^&=]*|gclid|fbclid|ref)=[^&]*", "&")
    val q2 = regexp_replace(regexp_replace(q1, "&&+", "&"), "^&|&$", "")
    when(proto.isNull || host.isNull, lit(null).cast("string"))
      .otherwise(concat(
        proto, lit("://"), host,
        when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
        path,
        when(q2 =!= "", concat(lit("?"), q2)).otherwise(lit(""))))
  }

  /** Two-level public suffixes common enough to matter for eTLD+1
    * grouping without shipping the full PSL (which is data, not code —
    * load it as a broadcast table if exactness beyond these matters).
    */
  private val twoLevelSuffixes = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
    "com.au", "net.au", "org.au", "co.jp", "or.jp", "ne.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "com.tw",
    "com.sg", "co.za", "com.ar", "com.tr")

  /** Registered domain (eTLD+1 approximation) of a URL: the last two
    * host labels, or three when the last two are a known two-level
    * public suffix; a bare `www.` is never part of it. NULL for
    * hostless inputs.
    */
  def registeredDomain(url: Column): Column = {
    val host = lower(try_parse_url(url, lit("HOST")))
    val labels = split(host, "\\.")
    val n = size(labels)
    val lastTwo = concat_ws(".",
      element_at(labels, -2), element_at(labels, -1))
    val lastThree = concat_ws(".", element_at(labels, -3),
      element_at(labels, -2), element_at(labels, -1))
    when(host.isNull, lit(null).cast("string"))
      .when(n <= 2, host)
      .when(lastTwo.isin(twoLevelSuffixes: _*), lastThree)
      .otherwise(lastTwo)
  }

  /** Keep at most `maxPerDomain` rows per domain, chosen
    * deterministically by (salted hash coin, id) — the Dolma-style
    * domain cap that stops a single crawler-friendly site from
    * dominating the corpus. `domainCol` is any string expression
    * (typically [[registeredDomain]] of the url column).
    *
    * Exact and scale-safe: a (domain, task-salt) window pre-prunes to
    * `maxPerDomain` rows per salt (map-side bounded via the window
    * group limit), then the final per-domain window ranks at most
    * fanout x cap survivors — a 100M-page domain costs fanout x cap
    * reducer rows, not 100M.
    */
  def capPerDomain(df: DataFrame, domainCol: Column, idCol: String,
      maxPerDomain: Int, salt: String = ""): DataFrame = {
    require(maxPerDomain > 0, "maxPerDomain must be positive")
    val fanout = 32
    val ord = Seq(Mixing.hashUniform(col(idCol), salt).asc, col(idCol).asc)
    val w1 = Window.partitionBy(col("_dom"), col("_dsalt")).orderBy(ord: _*)
    val w2 = Window.partitionBy(col("_dom")).orderBy(ord: _*)
    df.withColumn("_dom", domainCol)
      .withColumn("_dsalt", spark_partition_id() % fanout)
      .withColumn("_r1", row_number().over(w1))
      .filter(col("_r1") <= maxPerDomain)
      .withColumn("_r2", row_number().over(w2))
      .filter(col("_r2") <= maxPerDomain)
      .drop("_dsalt", "_r1", "_r2", "_dom")
  }

  /** Drop rows whose REGISTERED domain is on a blocklist (the
    * UT1/FineWeb adult-and-spam-domain stage). The list rides as a
    * literal array — blocklists are thousands of domains, not data —
    * so the filter is a pure projection inside the scan; subdomains of
    * a blocked domain are blocked with it (that is what registered
    * domain rollup is for). Unparseable URLs (null domain) pass — no
    * evidence is not evidence of badness.
    */
  def domainBlocklistFilter(df: DataFrame, urlCol: Column,
      blocked: Seq[String]): DataFrame = {
    require(blocked.nonEmpty, "blocklist must name at least one domain")
    val dom = registeredDomain(urlCol)
    df.filter(dom.isNull ||
      !dom.isin(blocked.map(_.toLowerCase): _*))
  }

  /** Per-domain corpus datasheet: pages, total chars, distinct
    * normalized URLs — one hash aggregation.
    */
  def domainStats(df: DataFrame, urlCol: Column, charsCol: Column): DataFrame =
    df.groupBy(registeredDomain(urlCol).as("domain"))
      .agg(count(lit(1)).as("pages"),
        sum(charsCol).cast("long").as("chars"),
        countDistinct(normalizeUrl(urlCol)).as("distinct_urls"))
}
