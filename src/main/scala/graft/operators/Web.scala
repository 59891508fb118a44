package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** URL / domain curation operators — the web-corpus half of a
  * training-data pipeline (RefinedWeb/C4-style): parse URLs into
  * components, canonicalize them for exact-dup keying, and bound
  * per-domain corpus share.
  *
  * Scale shape: everything here is either a narrow per-row projection
  * (parse, normalize — whole-stage codegen over built-in `parse_url` /
  * string functions, no UDF) or ONE hash-partitioned window keyed by
  * registered domain (`domainCap`) — the same single-shuffle shape as
  * `Corpus.sourceCap`. Blocklists broadcast. Nothing is driver-side.
  *
  * Determinism: `domainCap` priorities come from `md5(id)` (never
  * `rand()`), reproducible across runs and engines like
  * `Corpus.sampleByHash`.
  */
object Web {

  /** Public suffixes with two labels that [[registeredDomain]]
    * recognizes (a bounded, plan-time list — the full PSL would ride
    * along the same way as a broadcast set; the semantics under test
    * are the label arithmetic).
    */
  val TwoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au",
    "co.jp", "ne.jp", "com.br", "co.in", "com.cn", "com.mx")

  /** Lowercased host of a URL (hosts are case-insensitive per RFC
    * 3986 §3.2.2; paths and queries are NOT touched).
    */
  def host(url: Column): Column = lower(parse_url(url, lit("HOST")))

  /** Explicit port of a URL as int, null when the URL carries none.
    * (`parse_url` has no PORT part; the authority suffix is the
    * grammar-level definition.)
    */
  def port(url: Column): Column =
    nullif(regexp_extract(parse_url(url, lit("AUTHORITY")),
      ":(\\d+)$", 1), lit("")).cast("int")

  /** Registered (pay-level) domain of a lowercased host: the last two
    * labels, or the last three when the last two form a known
    * two-level public suffix (`site.co.uk`, not `co.uk`).
    */
  def registeredDomain(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".",
      element_at(labels, -2), element_at(labels, -1))
    val isSuffix2 = last2.isin(TwoLevelSuffixes: _*)
    when(n <= 2, hostCol)
      .otherwise(when(isSuffix2,
        concat_ws(".", element_at(labels, -3), last2)).otherwise(last2))
  }

  /** Query-param keys dropped by [[normalizeUrl]]: click/campaign
    * trackers that fragment otherwise-identical URLs (the C4/CCNet
    * canonicalization set).
    */
  val TrackingKeys: Seq[String] =
    Seq("fbclid", "gclid", "msclkid", "ref", "igshid")

  private def isTracking(param: Column): Column = {
    val key = split(param, "=").getItem(0)
    startswith(key, lit("utm_")) || key.isin(TrackingKeys: _*)
  }

  /** Canonical form of a URL, the key for URL-level exact dedup:
    * lowercase scheme + host, default ports stripped (http:80 /
    * https:443), fragment dropped, tracking params dropped, surviving
    * query params sorted bytewise, empty path rewritten to "/".
    */
  def normalizeUrl(url: Column): Column = {
    val scheme = lower(parse_url(url, lit("PROTOCOL")))
    val h = host(url)
    val p = port(url)
    val isDefault = (scheme === "http" && p === 80) ||
      (scheme === "https" && p === 443)
    val portPart = when(p.isNull || isDefault, lit(""))
      .otherwise(concat(lit(":"), p.cast("string")))
    val rawPath = parse_url(url, lit("PATH"))
    val path = when(rawPath.isNull || rawPath === "", lit("/"))
      .otherwise(rawPath)
    val q = parse_url(url, lit("QUERY"))
    val kept = array_sort(filter(split(q, "&"),
      param => !isTracking(param)))
    val qPart = when(q.isNull || size(kept) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(kept, "&")))
    concat(scheme, lit("://"), h, portPart, path, qPart)
  }

  /** Parse `urlCol` into flat component columns: `scheme`, `host`
    * (lowercased), `port` (int, null when absent), `reg_domain`,
    * `path`, `n_params` (0 for no query), `has_frag`.
    */
  def parseUrls(df: DataFrame, urlCol: String): DataFrame = {
    val u = col(urlCol)
    val h = host(u)
    val q = parse_url(u, lit("QUERY"))
    df.withColumn("scheme", lower(parse_url(u, lit("PROTOCOL"))))
      .withColumn("host", h)
      .withColumn("port", port(u))
      .withColumn("reg_domain", registeredDomain(h))
      .withColumn("path", parse_url(u, lit("PATH")))
      .withColumn("n_params",
        when(q.isNull, lit(0)).otherwise(size(split(q, "&"))))
      .withColumn("has_frag", parse_url(u, lit("REF")).isNotNull)
  }

  /** Keep at most `cap` rows per registered domain, by deterministic
    * md5-of-id priority (RefinedWeb's per-domain bound against SEO
    * farms dominating the corpus). Adds `reg_domain` and the 1-based
    * `domain_rank` of each surviving row. One hash-partitioned window;
    * at 100 TB the heavy-domain skew this guards against is exactly
    * why the cap exists — the window never ranks past what one
    * partition holds for a domain, and capped output is bounded by
    * cap · |domains|.
    */
  def domainCap(df: DataFrame, urlCol: String, idCol: String,
                cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dom = registeredDomain(host(col(urlCol)))
    val w = Window.partitionBy(col("reg_domain"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("reg_domain", dom)
      .withColumn("domain_rank", row_number().over(w))
      .filter(col("domain_rank") <= cap)
  }

  /** Drop rows whose registered domain is in `blocked` (URL-level
    * blocklist filtering). The blocklist broadcasts: corpus-side the
    * filter is a narrow broadcast anti-join, never a shuffle.
    */
  def blocklistFilter(df: DataFrame, urlCol: String,
                      blocked: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val b = broadcast(blocked.toDF("__blocked_domain"))
    df.withColumn("reg_domain", registeredDomain(host(col(urlCol))))
      .join(b, col("reg_domain") === col("__blocked_domain"),
        "left_anti")
  }
}
