package graft.extensions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.Q
import graft.operators.Web
import graft.tables.Tables.documents

/** Driver-checked queries for the URL/domain curation operators
  * ([[graft.operators.Web]]).
  *
  * Oracle pattern (same as the multimodal BMP/MP3 gates): each doc
  * synthesizes a REAL URL string from doc_id arithmetic — subdomain,
  * two-level-suffix TLDs, case noise in the host, explicit default and
  * non-default ports, root and nested paths, tracking and payload
  * query params in id-dependent order, fragments — and the engine runs
  * its actual `parse_url`-based operators over those strings. The
  * DuckDB oracle never parses a URL: it re-derives every expected
  * component from the same arithmetic, so any defect in host
  * lowercasing, the public-suffix label logic, port extraction,
  * tracking-param stripping, param sorting, or default-port removal
  * breaks the hash compare.
  */
private[graft] object WebQueries {

  // ---- synthetic URL (engine side, pure Column expressions) ----------

  private def s(c: Column): Column = c.cast("string")

  private def hostLower(id: Column): Column = {
    val sub = element_at(array(lit(""), lit("www."), lit("cdn.")),
      (pmod(id, lit(3)) + 1).cast("int"))
    val tld = element_at(
      array(lit("com"), lit("org"), lit("co.uk"), lit("io")),
      (pmod(id, lit(4)) + 1).cast("int"))
    concat(sub, lit("site"), s(pmod(id, lit(97))), lit("."), tld)
  }

  private def scheme(id: Column): Column =
    when(pmod(id, lit(2)) === 0, lit("https")).otherwise(lit("http"))

  private def syntheticUrl(id: Column): Column = {
    val rawHost = when(pmod(id, lit(5)) === 0, upper(hostLower(id)))
      .otherwise(hostLower(id))
    val portPart = when(pmod(id, lit(7)) === 0, lit(":8080"))
      .when(pmod(id, lit(7)) === 1,
        when(scheme(id) === "https", lit(":443")).otherwise(lit(":80")))
      .otherwise(lit(""))
    val path = when(pmod(id, lit(11)) === 0, lit("/"))
      .otherwise(concat(lit("/art/"), s(pmod(id, lit(50)))))
    val pUtm = when(pmod(id, lit(2)) === 0, lit("utm_source=feed"))
    val pQ = when(pmod(id, lit(17)) =!= 0, concat(lit("q="), s(pmod(id, lit(10)))))
    val pPage = when(pmod(id, lit(3)) =!= 0, concat(lit("page="), s(pmod(id, lit(5)))))
    val pF = when(pmod(id, lit(13)) === 0, concat(lit("fbclid=x"), s(pmod(id, lit(7)))))
    val ordered = when(pmod(id, lit(4)) < 2, array(pUtm, pQ, pPage, pF))
      .otherwise(array(pQ, pPage, pUtm, pF))
    val present = filter(ordered, p => p.isNotNull)
    val qPart = when(size(present) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(present, "&")))
    val frag = when(pmod(id, lit(6)) === 0, concat(lit("#sec"), s(pmod(id, lit(3)))))
      .otherwise(lit(""))
    concat(scheme(id), lit("://"), rawHost, portPart, path, qPart, frag)
  }

  private def urls(sp: org.apache.spark.sql.SparkSession, dir: String) =
    documents(sp, dir).select(col("doc_id"),
      syntheticUrl(col("doc_id")).as("url"))

  /** Synthetic robots.txt body for host index `k`: a comment line, a
    * GraftBot-led group (absent when k%4==3, leaving its directives
    * group-less — RFC 9309 says such lines are ignored; STACKED with a
    * `newsbot` header line when k%6==1, so its rules belong to both
    * agents; always carrying a §2.2.3 WILDCARD + end-anchor rule on
    * the `/d/` tree — star, `.pdf`, dollar-anchored; carrying a
    * `Crawl-delay` when k is odd), a `*` group
    * (with its own `Crawl-delay` when k%5==0 — shadowed for graftbot
    * whenever a specific group exists), an `evilbot` group,
    * group-INDEPENDENT `Sitemap:` discovery lines (one up top for every
    * host, a lowercase-field second INSIDE the `*` group for even k —
    * it must neither break the group nor scope to it), and — when
    * k%8==3 — a trailing EMPTY GraftBot group at EOF (RFC 9309
    * §2.2.1: an empty specific group still shadows `*` and allows
    * everything). Case noise in field names and a blank separator
    * line throughout.
    */
  private def robotsBody(k: Column): Column = {
    val m = s(pmod(k, lit(5)))
    concat(
      lit("# robots "), s(k), lit("\n"),
      lit("Sitemap: https://site"), s(k), lit(".com/sitemap"),
      s(pmod(k, lit(3))), lit(".xml\n"),
      when(pmod(k, lit(4)) =!= 3, lit("User-Agent: GraftBot\n"))
        .otherwise(lit("")),
      when(pmod(k, lit(4)) =!= 3 && pmod(k, lit(6)) === 1,
        lit("User-agent: newsbot\n")).otherwise(lit("")),
      lit("Disallow: /private"), m, lit("/\n"),
      when(pmod(k, lit(2)) === 0,
        concat(lit("Allow: /private"), m, lit("/pub/\n")))
        .otherwise(lit("")),
      when(pmod(k, lit(3)) === 0, lit("disallow: /tmp\n"))
        .otherwise(lit("")),
      lit("Disallow: /d/*.pdf$\n"),
      when(pmod(k, lit(2)) === 1,
        concat(lit("Crawl-delay: "), s(pmod(k, lit(7)) + 1), lit("\n")))
        .otherwise(lit("")),
      lit("\nUser-agent: *\n"),
      when(pmod(k, lit(2)) === 0,
        concat(lit("sitemap: https://cdn"), s(k),
          lit(".example/sm.xml\n"))).otherwise(lit("")),
      lit("Disallow: /blog/\n"),
      when(pmod(k, lit(5)) === 0, lit("Crawl-delay: 10\n"))
        .otherwise(lit("")),
      lit("User-agent: evilbot\n"),
      lit("Disallow: /\n"),
      when(pmod(k, lit(8)) === 3, lit("User-Agent: GraftBot\n"))
        .otherwise(lit("")))
  }

  /** One row per synthetic host: `(host, robots)` for k in 0..19. */
  private def robotsHosts(sp: org.apache.spark.sql.SparkSession,
                          dir: String) =
    documents(sp, dir)
      .select(pmod(col("doc_id"), lit(20)).as("k")).distinct()
      .select(concat(lit("site"), s(col("k")), lit(".com")).as("host"),
        robotsBody(col("k")).as("robots"))

  // ---- oracle arithmetic (DuckDB side, component re-derivation) ------

  /** CTE deriving the expected components for each doc_id. */
  private val oracleComponents: String =
    """u AS (SELECT doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END AS scheme,
      |  (CASE doc_id % 3 WHEN 0 THEN '' WHEN 1 THEN 'www.' ELSE 'cdn.'
      |    END) || 'site' || CAST(doc_id % 97 AS VARCHAR) || '.' ||
      |   (CASE doc_id % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
      |    WHEN 2 THEN 'co.uk' ELSE 'io' END) AS host,
      |  'site' || CAST(doc_id % 97 AS VARCHAR) || '.' ||
      |   (CASE doc_id % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
      |    WHEN 2 THEN 'co.uk' ELSE 'io' END) AS reg_domain,
      |  CASE WHEN doc_id % 7 = 0 THEN 8080 WHEN doc_id % 7 = 1 THEN
      |   (CASE WHEN doc_id % 2 = 0 THEN 443 ELSE 80 END)
      |   ELSE NULL END AS port,
      |  CASE WHEN doc_id % 11 = 0 THEN '/'
      |   ELSE '/art/' || CAST(doc_id % 50 AS VARCHAR) END AS path,
      |  doc_id % 2 = 0 AS has_utm, doc_id % 17 != 0 AS has_q,
      |  doc_id % 3 != 0 AS has_page, doc_id % 13 = 0 AS has_f
      | FROM documents)""".stripMargin

  val all: Seq[Q] = Seq(

    // Components out of the real parser vs the generator arithmetic.
    // port is -1-coalesced on both sides so the column stays integer
    // (a NULL would float-ify one pandas load path in the compare).
    Q("ext_url_parse",
      s"""WITH $oracleComponents
         |SELECT doc_id, scheme, host, reg_domain, path,
         | CAST(coalesce(port, -1) AS INT) AS port,
         | CAST(CAST(has_utm AS INT) + CAST(has_q AS INT) +
         |   CAST(has_page AS INT) + CAST(has_f AS INT) AS INT)
         |   AS n_params,
         | doc_id % 6 = 0 AS has_frag
         |FROM u ORDER BY doc_id""".stripMargin) { (sp, dir) =>
      Web.parseUrls(urls(sp, dir), "url")
        .select(col("doc_id"), col("scheme"), col("host"),
          col("reg_domain"), col("path"),
          coalesce(col("port"), lit(-1)).as("port"),
          col("n_params"), col("has_frag"))
        .orderBy(col("doc_id"))
    },

    // Canonicalization: lowercase scheme/host, default ports stripped
    // (explicit :8080 survives), fragment gone, utm_*/fbclid params
    // dropped, survivors sorted ('page=' < 'q=' bytewise).
    Q("ext_url_normalize",
      s"""WITH $oracleComponents
         |SELECT doc_id, scheme || '://' || host ||
         | (CASE WHEN doc_id % 7 = 0 THEN ':8080' ELSE '' END) || path ||
         | (CASE
         |   WHEN has_page AND has_q THEN
         |    '?page=' || CAST(doc_id % 5 AS VARCHAR) ||
         |    '&q=' || CAST(doc_id % 10 AS VARCHAR)
         |   WHEN has_page THEN '?page=' || CAST(doc_id % 5 AS VARCHAR)
         |   WHEN has_q THEN '?q=' || CAST(doc_id % 10 AS VARCHAR)
         |   ELSE '' END) AS url_norm
         |FROM u ORDER BY doc_id""".stripMargin) { (sp, dir) =>
      urls(sp, dir)
        .select(col("doc_id"), Web.normalizeUrl(col("url")).as("url_norm"))
        .orderBy(col("doc_id"))
    },

    // Per-registered-domain cap (RefinedWeb's SEO-farm bound): md5
    // priority, at most 3 docs survive per domain. The oracle windows
    // over the SAME md5 text, so rank and membership are bit-checked.
    Q("ext_domain_cap",
      s"""WITH $oracleComponents
         |SELECT doc_id, reg_domain, CAST(rn AS INT) AS domain_rank
         |FROM (SELECT doc_id, reg_domain, row_number() OVER (
         |   PARTITION BY reg_domain
         |   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
         |  FROM u)
         |WHERE rn <= 3 ORDER BY reg_domain, domain_rank""".stripMargin) {
      (sp, dir) =>
        Web.domainCap(urls(sp, dir), "url", "doc_id", cap = 3)
          .select(col("doc_id"), col("reg_domain"), col("domain_rank"))
          .orderBy(col("reg_domain"), col("domain_rank"))
    },

    // URL-level dedup: superficial raw variants (host case, explicit
    // default port, utm param, fragment) of the SAME page collapse to
    // one canonical URL. 8 core pages fan out to dozens of raw
    // spellings across the corpus; the gate checks the canonical key,
    // how many docs share it, and how many distinct raw spellings the
    // normalizer collapsed.
    Q("ext_url_dedup",
      """WITH v AS (SELECT doc_id, doc_id % 8 AS j,
        |  (CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) || ',' ||
        |  (CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) || ',' ||
        |  (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) || ',' ||
        |  (CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS variant
        | FROM documents)
        |SELECT 'https://site' || CAST(j AS VARCHAR) || '.com/p' ||
        |  CAST(j AS VARCHAR) || '?q=' || CAST(j AS VARCHAR) AS url_norm,
        | CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(count(DISTINCT variant) AS BIGINT) AS n_variants,
        | CAST(min(doc_id) AS BIGINT) AS min_doc
        |FROM v GROUP BY j ORDER BY url_norm""".stripMargin) { (sp, dir) =>
      val id = col("doc_id")
      val j = s(pmod(id, lit(8)))
      val hostRaw = concat(lit("site"), j, lit(".com"))
      val raw = concat(
        lit("https://"),
        when(pmod(id, lit(5)) === 0, upper(hostRaw)).otherwise(hostRaw),
        when(pmod(id, lit(7)) === 0, lit(":443")).otherwise(lit("")),
        lit("/p"), j,
        lit("?"),
        when(pmod(id, lit(2)) === 0, lit("utm_source=feed&"))
          .otherwise(lit("")),
        lit("q="), j,
        when(pmod(id, lit(3)) === 0, lit("#top")).otherwise(lit("")))
      documents(sp, dir).select(id, raw.as("url"))
        .withColumn("url_norm", Web.normalizeUrl(col("url")))
        .groupBy(col("url_norm"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("url")).as("n_variants"),
          min(col("doc_id")).as("min_doc"))
        .orderBy(col("url_norm"))
    },

    // robots.txt parse: REAL RFC 9309-shaped bodies (comments, blank
    // lines, case-noisy field names, a group-less directive block that
    // must be dropped, STACKED two-agent group headers whose rules fan
    // out to both agents, Crawl-delay lines, an EMPTY trailing group
    // that must still emit its marker row) synthesized per host; the
    // engine runs its actual line parser + header-run attribution, the
    // oracle re-derives every marker and directive row from the
    // generator arithmetic.
    Q("ext_robots_parse",
      """WITH k AS (SELECT DISTINCT doc_id % 20 AS k FROM documents),
        |ga AS (
        | SELECT k, 'graftbot' AS agent FROM k WHERE k % 4 != 3
        | UNION ALL
        | SELECT k, 'newsbot' FROM k WHERE k % 4 != 3 AND k % 6 = 1),
        |r AS (
        | SELECT k, agent, 'agent' AS rule, '' AS prefix FROM ga
        | UNION ALL
        | SELECT k, 'graftbot', 'agent', '' FROM k WHERE k % 8 = 3
        | UNION ALL SELECT k, '*', 'agent', '' FROM k
        | UNION ALL SELECT k, 'evilbot', 'agent', '' FROM k
        | UNION ALL
        | SELECT k, agent, 'disallow',
        |  '/private' || CAST(k % 5 AS VARCHAR) || '/' FROM ga
        | UNION ALL
        | SELECT k, agent, 'allow',
        |  '/private' || CAST(k % 5 AS VARCHAR) || '/pub/'
        | FROM ga WHERE k % 2 = 0
        | UNION ALL
        | SELECT k, agent, 'disallow', '/tmp' FROM ga WHERE k % 3 = 0
        | UNION ALL SELECT k, agent, 'disallow', '/d/*.pdf$' FROM ga
        | UNION ALL
        | SELECT k, agent, 'crawl-delay', CAST(k % 7 + 1 AS VARCHAR)
        | FROM ga WHERE k % 2 = 1
        | UNION ALL SELECT k, '*', 'disallow', '/blog/' FROM k
        | UNION ALL
        | SELECT k, '*', 'crawl-delay', '10' FROM k WHERE k % 5 = 0
        | UNION ALL SELECT k, 'evilbot', 'disallow', '/' FROM k)
        |SELECT 'site' || CAST(k AS VARCHAR) || '.com' AS host,
        | agent, rule, prefix, CAST(length(prefix) AS INT) AS prefix_len
        |FROM r ORDER BY host, agent, rule, prefix""".stripMargin) {
      (sp, dir) =>
        Web.parseRobots(robotsHosts(sp, dir), "host", "robots")
          .select(col("host"), col("agent"), col("rule"), col("prefix"),
            col("prefix_len"))
          .orderBy(col("host"), col("agent"), col("rule"), col("prefix"))
    },

    // sitemap.xml parse: REAL per-host sitemap documents (XML preamble,
    // urlset, variable url-block counts, whitespace-padded loc values,
    // optional lastmod/priority fields) through the real block parser;
    // the oracle regenerates every (host, loc, lastmod, priority) row
    // arithmetically. priority reaches the gate through an identical
    // string-to-double cast on both engines; nullable fields are
    // sentinel-coalesced so the compare stays scalar-typed.
    Q("ext_sitemap",
      """WITH k AS (SELECT DISTINCT doc_id % 20 AS k FROM documents),
        |u AS (SELECT k.k, r.i FROM k, range(4) r(i)
        |  WHERE r.i <= k.k % 4)
        |SELECT 'site' || CAST(k AS VARCHAR) || '.com' AS host,
        | 'https://site' || CAST(k AS VARCHAR) || '.com/page' ||
        |  CAST(i AS VARCHAR) AS loc,
        | coalesce(CASE WHEN i % 2 = 0
        |   THEN '2026-01-0' || CAST(i % 7 + 1 AS VARCHAR) END, '')
        |  AS lastmod,
        | coalesce(CASE WHEN i % 3 = 0 THEN
        |   CAST('0.' || CAST(i % 5 + 5 AS VARCHAR) AS DOUBLE) END,
        |  -1.0) AS priority
        |FROM u ORDER BY host, loc""".stripMargin) { (sp, dir) =>
      val k = col("k")
      val idxs = sequence(lit(0L), pmod(k, lit(4)))
      val blocks = transform(idxs, i => concat(
        lit("<url>\n  <loc> https://site"), s(k), lit(".com/page"),
        s(i), lit(" </loc>\n"),
        when(pmod(i, lit(2)) === 0,
          concat(lit("  <lastmod>2026-01-0"), s(pmod(i, lit(7)) + 1),
            lit("</lastmod>\n"))).otherwise(lit("")),
        when(pmod(i, lit(3)) === 0,
          concat(lit("  <priority>0."), s(pmod(i, lit(5)) + 5),
            lit("</priority>\n"))).otherwise(lit("")),
        lit("</url>")))
      val xml = concat(lit("<?xml version=\"1.0\"?>\n<urlset>\n"),
        array_join(blocks, "\n"), lit("\n</urlset>"))
      val sitemaps = documents(sp, dir)
        .select(pmod(col("doc_id"), lit(20)).as("k")).distinct()
        .select(concat(lit("site"), s(k), lit(".com")).as("host"),
          xml.as("sitemap"))
      Web.sitemapUrls(sitemaps, "sitemap")
        .select(col("host"), col("loc"),
          coalesce(col("lastmod"), lit("")).as("lastmod"),
          coalesce(col("priority"), lit(-1.0)).as("priority"))
        .orderBy(col("host"), col("loc"))
    },

    // robots.txt fetch decisions for agent "graftbot": group selection
    // (the specific group shadows '*' where present — INCLUDING the
    // k%8==3 hosts whose graftbot group is EMPTY, which must allow
    // everything rather than fall back to '*'; hosts without any
    // graftbot group fall back to '*'), longest-pattern-match with
    // allow-wins ties (the /private{m}/pub/ carve-out inside a
    // disallowed tree), §2.2.3 wildcard + end-anchor matching (c=5
    // paths hit /d/*.pdf$ on even j and dodge its $ anchor on odd j),
    // default-allow. The oracle computes each decision with
    // closed-form CASE arithmetic.
    Q("ext_robots_eval",
      """WITH u AS (SELECT doc_id, doc_id % 20 AS k,
        |  (doc_id // 3) % 5 AS j, doc_id % 6 AS c FROM documents)
        |SELECT doc_id,
        | 'https://site' || CAST(k AS VARCHAR) || '.com' ||
        |  (CASE c
        |   WHEN 0 THEN '/private' || CAST(j AS VARCHAR) || '/x'
        |   WHEN 1 THEN '/private' || CAST(j AS VARCHAR) || '/pub/y'
        |   WHEN 2 THEN '/tmp/f' WHEN 3 THEN '/blog/post'
        |   WHEN 4 THEN '/ok'
        |   ELSE '/d/f' || CAST(j AS VARCHAR) ||
        |    (CASE WHEN j % 2 = 0 THEN '.pdf' ELSE '.pdfz' END)
        |   END) AS url,
        | CASE WHEN k % 4 != 3 THEN
        |   CASE c WHEN 0 THEN NOT (j = k % 5)
        |    WHEN 1 THEN NOT (j = k % 5 AND k % 2 = 1)
        |    WHEN 2 THEN NOT (k % 3 = 0)
        |    WHEN 5 THEN j % 2 != 0
        |    ELSE TRUE END
        |  WHEN k % 8 = 3 THEN TRUE
        |  ELSE c != 3 END AS allowed
        |FROM u ORDER BY doc_id""".stripMargin) { (sp, dir) =>
      val id = col("doc_id")
      val k = s(pmod(id, lit(20)))
      val j = s(pmod(expr("doc_id div 3"), lit(5)))
      val jn = pmod(expr("doc_id div 3"), lit(5))
      val c = pmod(id, lit(6))
      val path = when(c === 0, concat(lit("/private"), j, lit("/x")))
        .when(c === 1, concat(lit("/private"), j, lit("/pub/y")))
        .when(c === 2, lit("/tmp/f"))
        .when(c === 3, lit("/blog/post"))
        .when(c === 4, lit("/ok"))
        .otherwise(concat(lit("/d/f"), j,
          when(pmod(jn, lit(2)) === 0, lit(".pdf")).otherwise(lit(".pdfz"))))
      val us = documents(sp, dir).select(id,
        concat(lit("https://site"), k, lit(".com"), path).as("url"))
      val rules = Web.parseRobots(robotsHosts(sp, dir), "host", "robots")
      Web.robotsAllowed(us, "url", rules, "graftbot")
        .select(col("doc_id"), col("url"), col("allowed"))
        .orderBy(col("doc_id"))
    },

    // End-to-end crawl-frontier composition: sitemap seeds (REAL XML
    // through the real parser, paths landing in allowed and disallowed
    // trees) → robots.txt gate for graftbot (REAL bodies through the
    // real parser, group shadowing exercised both ways) → per-domain
    // politeness cap by md5 priority. Four operators chained under one
    // closed-form oracle.
    Q("ext_crawl_frontier",
      """WITH k AS (SELECT DISTINCT doc_id % 20 AS k FROM documents),
        |u AS (SELECT k.k, r.i FROM k, range(4) r(i)
        |  WHERE r.i <= k.k % 4),
        |seeds AS (SELECT k, i,
        |  'https://site' || CAST(k AS VARCHAR) || '.com' ||
        |  (CASE i % 3
        |   WHEN 0 THEN '/private' || CAST(k % 5 AS VARCHAR) || '/x' ||
        |    CAST(i AS VARCHAR)
        |   WHEN 1 THEN '/blog/p' || CAST(i AS VARCHAR)
        |   ELSE '/page' || CAST(i AS VARCHAR) END) AS loc FROM u),
        |gated AS (SELECT k, loc FROM seeds WHERE
        |  CASE i % 3 WHEN 0 THEN k % 4 = 3
        |   WHEN 1 THEN k % 4 != 3 OR k % 8 = 3 ELSE TRUE END),
        |capped AS (SELECT
        |  'site' || CAST(k AS VARCHAR) || '.com' AS reg_domain, loc,
        |  row_number() OVER (PARTITION BY k ORDER BY md5(loc), loc)
        |   AS rn FROM gated)
        |SELECT reg_domain, loc, CAST(rn AS INT) AS domain_rank
        |FROM capped WHERE rn <= 2
        |ORDER BY reg_domain, loc""".stripMargin) { (sp, dir) =>
      val k = col("k")
      val idxs = sequence(lit(0L), pmod(k, lit(4)))
      val blocks = transform(idxs, i => concat(
        lit("<url><loc>https://site"), s(k), lit(".com"),
        when(pmod(i, lit(3)) === 0,
          concat(lit("/private"), s(pmod(k, lit(5))), lit("/x"), s(i)))
          .when(pmod(i, lit(3)) === 1, concat(lit("/blog/p"), s(i)))
          .otherwise(concat(lit("/page"), s(i))),
        lit("</loc></url>")))
      val sitemaps = documents(sp, dir)
        .select(pmod(col("doc_id"), lit(20)).as("k")).distinct()
        .select(concat(lit("<urlset>"), array_join(blocks, "\n"),
          lit("</urlset>")).as("sitemap"))
      val seeds = Web.sitemapUrls(sitemaps, "sitemap").select(col("loc"))
      val rules = Web.parseRobots(robotsHosts(sp, dir), "host", "robots")
      val gated = Web.robotsAllowed(seeds, "loc", rules, "graftbot")
        .filter(col("allowed")).select(col("loc"))
      Web.domainCap(gated, "loc", "loc", cap = 2)
        .select(col("reg_domain"), col("loc"), col("domain_rank"))
        .orderBy(col("reg_domain"), col("loc"))
    },

    // Two-level sitemap expansion: REAL <sitemapindex> XML through the
    // real index parser, each child loc joined to its (synthesized,
    // REAL-XML) urlset and pushed through the real <url> parser — the
    // layout every site beyond the 50k-URL cap ships. The oracle
    // regenerates the full (host, child_loc, loc) expansion
    // arithmetically.
    Q("ext_sitemap_index",
      """WITH k AS (SELECT DISTINCT doc_id % 20 AS k FROM documents),
        |c AS (SELECT k.k, r.i FROM k, range(3) r(i)
        |  WHERE r.i <= k.k % 3),
        |u AS (SELECT c.k, c.i, r2.j FROM c, range(2) r2(j)
        |  WHERE r2.j <= c.i % 2)
        |SELECT 'site' || CAST(k AS VARCHAR) || '.com' AS host,
        | 'https://site' || CAST(k AS VARCHAR) || '.com/sitemap' ||
        |  CAST(i AS VARCHAR) || '.xml' AS child_loc,
        | 'https://site' || CAST(k AS VARCHAR) || '.com/s' ||
        |  CAST(i AS VARCHAR) || '/p' || CAST(j AS VARCHAR) AS loc
        |FROM u ORDER BY host, child_loc, loc""".stripMargin) {
      (sp, dir) =>
        val k = col("k")
        val idxs = sequence(lit(0L), pmod(k, lit(3)))
        val blocks = transform(idxs, i => concat(
          lit("<sitemap>\n  <loc> https://site"), s(k),
          lit(".com/sitemap"), s(i), lit(".xml </loc>\n"),
          when(pmod(i, lit(2)) === 0,
            lit("  <lastmod>2026-02-01</lastmod>\n")).otherwise(lit("")),
          lit("</sitemap>")))
        val indexXml = concat(
          lit("<?xml version=\"1.0\"?>\n<sitemapindex>\n"),
          array_join(blocks, "\n"), lit("\n</sitemapindex>"))
        val hosts = documents(sp, dir)
          .select(pmod(col("doc_id"), lit(20)).as("k")).distinct()
          .select(concat(lit("site"), s(k), lit(".com")).as("host"),
            indexXml.as("idx_xml"))
        val children = Web.sitemapIndex(hosts, "idx_xml")
          .select(col("host"), col("child_loc"))
        // child urlset bodies keyed by the PARSED child_loc (so a
        // mis-parsed loc can never find its body)
        val i = regexp_extract(col("child_loc"),
          "sitemap(\\d+)\\.xml$", 1).cast("long")
        val js = sequence(lit(0L), pmod(i, lit(2)))
        val urlBlocks = transform(js, j => concat(
          lit("<url><loc>https://"), Web.host(col("child_loc")),
          lit("/s"), s(i), lit("/p"), s(j), lit("</loc></url>")))
        val withXml = children.withColumn("child_xml",
          concat(lit("<urlset>"), array_join(urlBlocks, "\n"),
            lit("</urlset>")))
        Web.sitemapUrls(withXml, "child_xml")
          .select(col("host"), col("child_loc"), col("loc"))
          .orderBy(col("host"), col("child_loc"), col("loc"))
    },

    // Politeness scheduling composition: sitemap seeds → robots gate
    // (allowed + the SELECTED group's crawl_delay) → per-host fetch
    // slots by md5 priority with fetch_offset_s = slot × delay
    // (default 1 s where the host declares none). The oracle re-plays
    // the gate decision, the delay selection and the window
    // arithmetic in closed form — slot × delay products are exact
    // small-int × exact-double, so the hash compare is bitwise.
    Q("ext_frontier_schedule",
      """WITH k AS (SELECT DISTINCT doc_id % 20 AS k FROM documents),
        |u AS (SELECT k.k, r.i FROM k, range(4) r(i)
        |  WHERE r.i <= k.k % 4),
        |seeds AS (SELECT k, i,
        |  'https://site' || CAST(k AS VARCHAR) || '.com' ||
        |  (CASE i % 3
        |   WHEN 0 THEN '/private' || CAST(k % 5 AS VARCHAR) || '/x' ||
        |    CAST(i AS VARCHAR)
        |   WHEN 1 THEN '/blog/p' || CAST(i AS VARCHAR)
        |   ELSE '/page' || CAST(i AS VARCHAR) END) AS loc FROM u),
        |gated AS (SELECT k, loc FROM seeds WHERE
        |  CASE i % 3 WHEN 0 THEN k % 4 = 3
        |   WHEN 1 THEN k % 4 != 3 OR k % 8 = 3 ELSE TRUE END),
        |d AS (SELECT k, CASE WHEN k % 4 != 3 THEN
        |   CASE WHEN k % 2 = 1 THEN CAST(k % 7 + 1 AS DOUBLE)
        |    ELSE 1.0 END
        |  WHEN k % 8 = 3 THEN 1.0
        |  WHEN k % 5 = 0 THEN 10.0 ELSE 1.0 END AS delay FROM k),
        |sch AS (SELECT k, loc, row_number() OVER (PARTITION BY k
        |   ORDER BY md5(loc), loc) - 1 AS slot FROM gated)
        |SELECT 'site' || CAST(sch.k AS VARCHAR) || '.com' AS host,
        | loc, CAST(slot AS INT) AS fetch_slot,
        | slot * delay AS fetch_offset_s
        |FROM sch JOIN d ON sch.k = d.k
        |ORDER BY host, loc""".stripMargin) { (sp, dir) =>
      val k = col("k")
      val idxs = sequence(lit(0L), pmod(k, lit(4)))
      val blocks = transform(idxs, i => concat(
        lit("<url><loc>https://site"), s(k), lit(".com"),
        when(pmod(i, lit(3)) === 0,
          concat(lit("/private"), s(pmod(k, lit(5))), lit("/x"), s(i)))
          .when(pmod(i, lit(3)) === 1, concat(lit("/blog/p"), s(i)))
          .otherwise(concat(lit("/page"), s(i))),
        lit("</loc></url>")))
      val sitemaps = documents(sp, dir)
        .select(pmod(col("doc_id"), lit(20)).as("k")).distinct()
        .select(concat(lit("<urlset>"), array_join(blocks, "\n"),
          lit("</urlset>")).as("sitemap"))
      val seeds = Web.sitemapUrls(sitemaps, "sitemap").select(col("loc"))
      val rules = Web.parseRobots(robotsHosts(sp, dir), "host", "robots")
      val gated = Web.robotsAllowed(seeds, "loc", rules, "graftbot")
        .filter(col("allowed"))
        .select(col("loc"), col("crawl_delay"))
      Web.frontierSchedule(gated, "loc", "crawl_delay",
          defaultDelaySec = 1.0)
        .select(Web.host(col("loc")).as("host"), col("loc"),
          col("fetch_slot"), col("fetch_offset_s"))
        .orderBy(col("host"), col("loc"))
    },

    // Sitemap discovery from robots.txt: the group-independent
    // `Sitemap:` lines every self-bootstrapping frontier starts from
    // (robots → sitemap URLs → urlset seeds → robots gate). One line
    // sits INSIDE the '*' group — it must be extracted anyway, must
    // not scope to the group, and must not break the group's rule
    // attribution (ext_robots_parse/eval stay green over the same
    // bodies).
    Q("ext_robots_sitemaps",
      """WITH k AS (SELECT DISTINCT doc_id % 20 AS k FROM documents),
        |r AS (
        | SELECT k, 'https://site' || CAST(k AS VARCHAR) ||
        |  '.com/sitemap' || CAST(k % 3 AS VARCHAR) || '.xml'
        |  AS sitemap_url FROM k
        | UNION ALL
        | SELECT k, 'https://cdn' || CAST(k AS VARCHAR) ||
        |  '.example/sm.xml' FROM k WHERE k % 2 = 0)
        |SELECT 'site' || CAST(k AS VARCHAR) || '.com' AS host,
        | sitemap_url
        |FROM r ORDER BY host, sitemap_url""".stripMargin) { (sp, dir) =>
      Web.robotsSitemaps(robotsHosts(sp, dir), "host", "robots")
        .select(col("host"), col("sitemap_url"))
        .orderBy(col("host"), col("sitemap_url"))
    },

    // Politeness delay surface: per host, the Crawl-delay of the group
    // SELECTED for graftbot — the specific group's own delay when it
    // declares one (odd k), null when the specific group exists but
    // declares none (even k — the '*' group's delay must be SHADOWED,
    // not inherited), null for the empty trailing group (k%8==3), and
    // the '*' delay only on true fallback hosts (k%4==3, k%8!=3).
    // blog_allowed rides along to pin that the same selected group
    // also drives the allow decision.
    Q("ext_crawl_delay",
      """WITH k AS (SELECT DISTINCT doc_id % 20 AS k FROM documents)
        |SELECT 'site' || CAST(k AS VARCHAR) || '.com' AS host,
        | CASE WHEN k % 4 != 3 THEN
        |   CASE WHEN k % 2 = 1 THEN CAST(k % 7 + 1 AS DOUBLE)
        |    ELSE -1.0 END
        |  WHEN k % 8 = 3 THEN -1.0
        |  WHEN k % 5 = 0 THEN 10.0 ELSE -1.0 END AS crawl_delay,
        | CASE WHEN k % 4 = 3 AND k % 8 != 3 THEN FALSE
        |  ELSE TRUE END AS blog_allowed
        |FROM k ORDER BY host""".stripMargin) { (sp, dir) =>
      val k = col("k")
      val us = documents(sp, dir)
        .select(pmod(col("doc_id"), lit(20)).as("k")).distinct()
        .select(concat(lit("site"), s(k), lit(".com")).as("h0"),
          concat(lit("https://site"), s(k), lit(".com/blog/p"))
            .as("url"))
      val rules = Web.parseRobots(robotsHosts(sp, dir), "host", "robots")
      Web.robotsAllowed(us, "url", rules, "graftbot")
        .select(col("h0").as("host"),
          coalesce(col("crawl_delay"), lit(-1.0)).as("crawl_delay"),
          col("allowed").as("blog_allowed"))
        .orderBy(col("host"))
    },

    // Query-string rule matching (RFC 9309 §2.2.2: rules match the
    // path PLUS the optional query): a wildcard rule targeting
    // '?sid=' sessions must hit '/p3?sid=3' but NOT '/p3?x=3&sid=1'
    // (no '?sid=' octet run there), a plain '/q' prefix must match
    // '/q?sid=pub' through its query, and an end-anchored
    // 'Allow: /q?sid=pub$' carve-out must out-rank both on even
    // hosts. A path-only matcher returns TRUE for every c=1/c=3 row
    // and breaks the compare.
    Q("ext_robots_query",
      """WITH u AS (SELECT doc_id, doc_id % 10 AS k, doc_id % 50 AS j,
        |  doc_id % 4 AS c FROM documents)
        |SELECT doc_id,
        | 'https://q' || CAST(k AS VARCHAR) || '.com' ||
        |  (CASE c WHEN 0 THEN '/p' || CAST(j AS VARCHAR)
        |   WHEN 1 THEN '/p' || CAST(j AS VARCHAR) || '?sid=' ||
        |    CAST(j AS VARCHAR)
        |   WHEN 2 THEN '/p' || CAST(j AS VARCHAR) || '?x=' ||
        |    CAST(j AS VARCHAR) || '&sid=1'
        |   ELSE '/q?sid=pub' END) AS url,
        | CASE c WHEN 0 THEN TRUE WHEN 1 THEN FALSE WHEN 2 THEN TRUE
        |  ELSE k % 2 = 0 END AS allowed
        |FROM u ORDER BY doc_id""".stripMargin) { (sp, dir) =>
      val id = col("doc_id")
      val k = pmod(id, lit(10))
      val j = s(pmod(id, lit(50)))
      val c = pmod(id, lit(4))
      val path = when(c === 0, concat(lit("/p"), j))
        .when(c === 1, concat(lit("/p"), j, lit("?sid="), j))
        .when(c === 2, concat(lit("/p"), j, lit("?x="), j, lit("&sid=1")))
        .otherwise(lit("/q?sid=pub"))
      val us = documents(sp, dir).select(id,
        concat(lit("https://q"), s(k), lit(".com"), path).as("url"))
      val hosts = documents(sp, dir)
        .select(pmod(col("doc_id"), lit(10)).as("k")).distinct()
        .select(concat(lit("q"), s(col("k")), lit(".com")).as("host"),
          concat(
            lit("User-agent: GraftBot\n"),
            lit("Disallow: /*?sid=\n"),
            lit("Disallow: /q\n"),
            when(pmod(col("k"), lit(2)) === 0,
              lit("Allow: /q?sid=pub$\n")).otherwise(lit("")))
            .as("robots"))
      val rules = Web.parseRobots(hosts, "host", "robots")
      Web.robotsAllowed(us, "url", rules, "graftbot")
        .select(col("doc_id"), col("url"), col("allowed"))
        .orderBy(col("doc_id"))
    },

    // Blocklist anti-join: three registered domains vanish; everything
    // else passes through with its derived reg_domain.
    Q("ext_domain_block",
      s"""WITH $oracleComponents
         |SELECT doc_id, reg_domain FROM u
         |WHERE reg_domain NOT IN
         | ('site3.com', 'site15.co.uk', 'site42.io')
         |ORDER BY doc_id""".stripMargin) { (sp, dir) =>
      Web.blocklistFilter(urls(sp, dir), "url",
          Seq("site3.com", "site15.co.uk", "site42.io"))
        .select(col("doc_id"), col("reg_domain"))
        .orderBy(col("doc_id"))
    })
}
