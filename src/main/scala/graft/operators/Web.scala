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

  /** Parse robots.txt bodies into rows `(host, agent, rule, prefix,
    * prefix_len, line_no)`. `rule` is one of:
    *   - `agent` — a GROUP-MARKER row, one per `User-agent:` line
    *     (`prefix` empty). Markers make rule-less groups visible: RFC
    *     9309 group selection must see that an empty specific group
    *     exists (it still shadows `*`), which directive rows alone
    *     cannot express.
    *   - `allow` / `disallow` — a path rule, fanned out to EVERY agent
    *     of its group's (possibly stacked) header.
    *   - `crawl-delay` — the de-facto politeness extension; `prefix`
    *     carries the raw delay token.
    *
    * RFC 9309 shapes covered: `#` comments, blank lines, case-
    * insensitive field names, directives before any `User-agent`
    * dropped, empty-path `Allow:`/`Disallow:` imposing no rule (but
    * still terminating a header run, per the grammar), and STACKED
    * group headers (§2.2 ABNF: consecutive `User-agent:` lines —
    * blank/comment lines between them don't split the run — form one
    * group whose rules belong to all named agents; a `User-agent:`
    * line after a rule line starts a new group).
    *
    * Scale shape: posexplode of lines, ONE host-partitioned window to
    * number header runs, then a per-(host, run) equi-join fanning each
    * directive to its header's agents — robots bodies are KB-sized, so
    * per-host partitions stay tiny no matter how many hosts the crawl
    * covers, and the fan-out is bounded by agents-per-header.
    */
  def parseRobots(df: DataFrame, hostCol: String,
                  contentCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = df.select(col(hostCol).as("host"),
      posexplode(split(col(contentCol), "\n")).as(Seq("line_no", "raw")))
    val clean = trim(regexp_replace(col("raw"), "#.*$", ""))
    val isUa = clean.rlike("(?i)^user-agent\\s*:")
    val uaName = lower(
      regexp_extract(clean, "(?i)^user-agent\\s*:\\s*(\\S+)", 1))
    val rule = lower(regexp_extract(clean,
      "(?i)^(allow|disallow|crawl-delay)\\s*:", 1))
    val value = regexp_extract(clean,
      "(?i)^(?:allow|disallow|crawl-delay)\\s*:\\s*(\\S+)", 1)
    // meaningful lines only (UA or rule field): blank/comment lines
    // between stacked User-agent lines must not split a header run
    val meaningful = lines
      .withColumn("__is_ua", isUa)
      .withColumn("__agent", uaName)
      .withColumn("__rule", rule)
      .withColumn("__value", value)
      .filter(col("__is_ua") || col("__rule") =!= "")
    val w = Window.partitionBy(col("host")).orderBy(col("line_no"))
    val runStart = col("__is_ua") &&
      !lag(col("__is_ua"), 1, false).over(w)
    val withGrp = meaningful
      .withColumn("__grp", sum(runStart.cast("int"))
        .over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    // dedupe per (host, run, agent) — a header run repeating the same
    // agent name (`User-agent: a` twice) must not double every
    // directive row; min(line_no) keeps the marker deterministic
    val agents = withGrp.filter(col("__is_ua") && col("__agent") =!= "")
      .groupBy(col("host"), col("__grp"), col("__agent").as("agent"))
      .agg(min(col("line_no")).as("line_no"))
    val markers = agents.select(col("host"), col("agent"),
      lit("agent").as("rule"), lit("").as("prefix"),
      lit(0).as("prefix_len"), col("line_no"))
    val directives = withGrp
      .filter(!col("__is_ua") && col("__value") =!= "")
      .select(col("host"), col("__grp"), col("__rule").as("rule"),
        col("__value").as("prefix"), col("line_no"))
    val fanned = directives
      .join(agents.select(col("host"), col("__grp"), col("agent")),
        Seq("host", "__grp"))
      .select(col("host"), col("agent"), col("rule"), col("prefix"),
        length(col("prefix")).cast("int").as("prefix_len"),
        col("line_no"))
    markers.unionByName(fanned)
  }

  /** `Sitemap:` directives of robots.txt bodies — the crawl-discovery
    * lines (sitemaps.org cross-submission / RFC 9309 §2.3 "other
    * records") that let a frontier BOOTSTRAP itself from robots alone:
    * robots → sitemap URLs → [[sitemapUrls]] seeds → [[robotsAllowed]]
    * gate. Per the protocol they are GROUP-INDEPENDENT (valid anywhere
    * in the file, not scoped to a `User-agent` header), so this is a
    * separate extraction from [[parseRobots]]'s group machinery: one
    * row per directive, `(host, sitemap_url, line_no)`, values taken
    * verbatim (they are absolute URLs by spec). Case-insensitive field
    * name, `#` comments stripped. One codegen projection + explode —
    * scan speed, no shuffle.
    */
  def robotsSitemaps(df: DataFrame, hostCol: String,
                     contentCol: String): DataFrame = {
    val lines = df.select(col(hostCol).as("host"),
      posexplode(split(col(contentCol), "\n")).as(Seq("line_no", "raw")))
    val clean = trim(regexp_replace(col("raw"), "#.*$", ""))
    lines
      .withColumn("sitemap_url",
        regexp_extract(clean, "(?i)^sitemap\\s*:\\s*(\\S+)", 1))
      .filter(col("sitemap_url") =!= "")
      .select(col("host"), col("sitemap_url"), col("line_no"))
  }

  /** Java-regex translation of an RFC 9309 §2.2.3 path pattern, null
    * for PLAIN prefixes (no `*`, no trailing `$`) — the common case,
    * which [[robotsAllowed]] matches with codegen `startswith` instead
    * of a regex. `*` matches any char sequence, a trailing `$` anchors
    * the end; everything else (including a mid-pattern `$`) is
    * literal, regex-escaped segment-wise. The translation runs ONCE
    * per rule on the tiny rules side.
    */
  private[operators] def pathPatternRegex(p: Column): Column = {
    val hasEnd = endswith(p, lit("$"))
    val isPlain = !contains(p, lit("*")) && !hasEnd
    val body = when(hasEnd, p.substr(lit(1), length(p) - 1)).otherwise(p)
    val esc = transform(split(body, "\\*", -1),
      s => regexp_replace(s, lit("([\\\\^$.|?*+()\\[\\]{}])"),
        lit("\\\\$1")))
    when(isPlain, lit(null).cast("string"))
      .otherwise(concat(lit("^"), array_join(esc, ".*"),
        when(hasEnd, lit("$")).otherwise(lit(""))))
  }

  /** RFC 9309 fetch decision for `agent` over every URL row: adds
    * `allowed` and `crawl_delay` (double; the politeness delay of the
    * SELECTED group, null when it declares none). Group selection per
    * host uses [[parseRobots]]'s group-marker rows: if any `User-agent`
    * line names `agent` exactly, ONLY the groups naming it apply — even
    * when they carry zero directives (RFC 9309 §2.2.1: the matching
    * group governs; an empty one allows everything) — else the `*`
    * groups; multiple matching groups' rules combine. Path rules match
    * per §2.2.3 against the URL's path PLUS its query when one is
    * present (`path?query`, per §2.2.2 — query-targeting rules like a
    * star followed by `?sessionid=` work): plain prefixes byte-wise,
    * `*` as any-sequence, a trailing `$` as an end anchor. Among matching rules the LONGEST
    * pattern (most octets, special chars counted — the reference REP
    * parser's precedence) wins, an `allow`/`disallow` tie at equal
    * length resolving to allow; no match ⇒ allowed (and hosts with no
    * robots rules allow everything). When the selected groups declare
    * several `Crawl-delay`s the MAX (most polite) is reported.
    *
    * `rules` must be [[parseRobots]] output (the marker rows carry the
    * group-existence signal).
    *
    * Shape: the group-selection aggregate, the per-host rule-array
    * rollup AND the wildcard→regex translation run on the TINY rules
    * side only; the corpus then takes one broadcast join and a narrow
    * array-fold projection — plain prefixes (the overwhelming majority
    * in real robots files) match via codegen `startswith`, only
    * wildcard rules pay a regex — and the URL table is never shuffled
    * and never grouped, so this runs at scan speed at 100 TB. (`urls`
    * must not already carry `host`/`__`-prefixed working columns.)
    */
  def robotsAllowed(urls: DataFrame, urlCol: String, rules: DataFrame,
                    agent: String): DataFrame = {
    val hostGroups = rules.filter(col("rule") === "agent")
      .groupBy(col("host"))
      .agg(max(col("agent") === lit(agent)).as("__has_specific"))
    val perHost = rules.join(hostGroups, Seq("host"))
      .filter(when(col("__has_specific"), col("agent") === lit(agent))
        .otherwise(col("agent") === lit("*")))
      .groupBy(col("host"))
      .agg(
        // collect_list skips the nulls the marker/delay rows produce
        collect_list(when(col("rule").isin("allow", "disallow"),
          struct(col("prefix"), col("prefix_len"),
            (col("rule") === "allow").as("al"),
            pathPatternRegex(col("prefix")).as("rex")))).as("__rules"),
        max(when(col("rule") === "crawl-delay",
          col("prefix").cast("double"))).as("__delay"))
    val emptyRules = array().cast(
      "array<struct<prefix:string,prefix_len:int,al:boolean,rex:string>>")
    // RFC 9309 §2.2.2: rules match the path AND the optional query
    // ('Disallow: /*?sessionid=' must be able to match) — the query is
    // re-attached after the empty-path -> "/" rewrite
    val q = parse_url(col(urlCol), lit("QUERY"))
    val u = urls.withColumn("__host", host(col(urlCol)))
      .withColumn("__path",
        concat(
          coalesce(nullif(parse_url(col(urlCol), lit("PATH")), lit("")),
            lit("/")),
          when(q.isNotNull, concat(lit("?"), q)).otherwise(lit(""))))
    u.join(broadcast(perHost), col("__host") === col("host"),
        "left_outer")
      .withColumn("__best",
        aggregate(
          filter(coalesce(col("__rules"), emptyRules),
            r => when(r.getField("rex").isNull,
                startswith(col("__path"), r.getField("prefix")))
              .otherwise(regexp_like(col("__path"),
                r.getField("rex")))),
          struct(lit(-1).as("len"), lit(1).as("al")),
          (acc, r) => {
            val len = r.getField("prefix_len")
            val al = r.getField("al").cast("int")
            when(len > acc.getField("len") ||
              (len === acc.getField("len") &&
                al > acc.getField("al")),
              struct(len.as("len"), al.as("al"))).otherwise(acc)
          }))
      .withColumn("allowed",
        col("__best.len") === -1 || col("__best.al") === 1)
      .withColumn("crawl_delay", col("__delay"))
      .drop("host", "__rules", "__best", "__host", "__path", "__delay")
  }

  /** Parse sitemap XML bodies (sitemaps.org protocol): one output row
    * per `<url>` block, keeping `df`'s columns and adding `loc`
    * (whitespace-trimmed, the protocol requires one per block),
    * `lastmod` (null when absent) and `priority` (double, null when
    * absent). Block-scoped regexp extraction like [[Html.htmlAnchors]]
    * — a field can never be read from a neighboring block — and one
    * codegen projection + explode, no UDF, scan speed at 100 TB.
    */
  def sitemapUrls(df: DataFrame, xmlCol: String): DataFrame = {
    val blocks = regexp_extract_all(col(xmlCol),
      lit("(?is)<url>(.*?)</url>"), lit(1))
    def field(b: Column, tag: String): Column =
      nullif(trim(regexp_extract(b,
        s"(?is)<$tag>(.*?)</$tag>", 1)), lit(""))
    val parsed = transform(blocks, b => struct(
      field(b, "loc").as("loc"),
      field(b, "lastmod").as("lastmod"),
      field(b, "priority").cast("double").as("priority")))
    df.withColumn("__u", explode(parsed))
      .select(df.columns.map(col) :+ col("__u.loc").as("loc") :+
        col("__u.lastmod").as("lastmod") :+
        col("__u.priority").as("priority"): _*)
      .drop("__u")
  }

  /** Parse sitemap INDEX bodies (sitemaps.org `<sitemapindex>` — the
    * two-level layout every large site uses once it passes the 50k-URL
    * per-file cap): one output row per `<sitemap>` block, keeping
    * `df`'s columns and adding `child_loc` (trimmed) and
    * `child_lastmod` (null when absent). Same block-scoped extraction
    * as [[sitemapUrls]]; compose the two for full index → urlset
    * expansion.
    */
  def sitemapIndex(df: DataFrame, xmlCol: String): DataFrame = {
    val blocks = regexp_extract_all(col(xmlCol),
      lit("(?is)<sitemap>(.*?)</sitemap>"), lit(1))
    def field(b: Column, tag: String): Column =
      nullif(trim(regexp_extract(b,
        s"(?is)<$tag>(.*?)</$tag>", 1)), lit(""))
    val parsed = transform(blocks, b => struct(
      field(b, "loc").as("child_loc"),
      field(b, "lastmod").as("child_lastmod")))
    df.withColumn("__s", explode(parsed))
      .select(df.columns.map(col) :+
        col("__s.child_loc").as("child_loc") :+
        col("__s.child_lastmod").as("child_lastmod"): _*)
      .drop("__s")
  }

  /** Politeness scheduling over a robots-gated frontier: per host,
    * order URLs by deterministic md5 priority (the [[domainCap]]
    * convention) and assign each a 0-based `fetch_slot` and its
    * `fetch_offset_s` — slot × the host's crawl delay (`delayCol`,
    * from [[robotsAllowed]]; `defaultDelaySec` where the host declares
    * none). The offset is when a single polite fetcher may issue the
    * request relative to the host's first fetch, which is exactly the
    * per-host rate budget a frontier scheduler feeds its work queue.
    *
    * Shape: ONE hash-partitioned window keyed by host — the
    * [[domainCap]] scale argument verbatim; per-host groups are
    * frontier-sized, not corpus-sized.
    */
  def frontierSchedule(df: DataFrame, urlCol: String, delayCol: String,
                       defaultDelaySec: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__sched_host"))
      .orderBy(md5(col(urlCol)), col(urlCol))
    df.withColumn("__sched_host", host(col(urlCol)))
      .withColumn("fetch_slot", row_number().over(w) - 1)
      .withColumn("fetch_offset_s",
        col("fetch_slot").cast("double") *
          coalesce(col(delayCol), lit(defaultDelaySec)))
      .drop("__sched_host")
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
