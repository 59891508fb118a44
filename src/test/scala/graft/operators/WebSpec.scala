package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WebSpec extends SparkSpec {
  import spark.implicits._

  private def one(url: String) = Seq((1L, url)).toDF("doc_id", "url")

  test("parseUrls extracts components and lowercases the host") {
    val r = Web.parseUrls(
        one("https://WWW.Example.CO.UK:8443/a/b?x=1&y=2#frag"), "url")
      .select("scheme", "host", "port", "reg_domain", "path",
        "n_params", "has_frag")
      .head()
    assert(r.getString(0) === "https")
    assert(r.getString(1) === "www.example.co.uk")
    assert(r.getInt(2) === 8443)
    assert(r.getString(3) === "example.co.uk")
    assert(r.getString(4) === "/a/b")
    assert(r.getInt(5) === 2)
    assert(r.getBoolean(6) === true)
  }

  test("parseUrls: no port -> null, no query -> 0 params") {
    val r = Web.parseUrls(one("http://a.example.com/p"), "url")
      .select("port", "reg_domain", "n_params", "has_frag").head()
    assert(r.isNullAt(0))
    assert(r.getString(1) === "example.com")
    assert(r.getInt(2) === 0)
    assert(r.getBoolean(3) === false)
  }

  test("registeredDomain: bare two-label host and deep subdomains") {
    val hosts = Seq("example.com", "a.b.c.example.com", "x.co.jp",
      "deep.sub.x.co.jp", "localhost").toDF("h")
    val got = hosts.select(Web.registeredDomain(col("h"))).as[String]
      .collect().toSeq
    assert(got === Seq("example.com", "example.com", "x.co.jp",
      "x.co.jp", "localhost"))
  }

  test("normalizeUrl strips default ports, fragments and trackers; sorts params") {
    val cases = Seq(
      "https://Ex.COM:443/p?utm_source=a&b=2&a=1#z" ->
        "https://ex.com/p?a=1&b=2",
      "http://ex.com:80/" -> "http://ex.com/",
      "http://ex.com:8080/p?fbclid=x" -> "http://ex.com:8080/p",
      // empty path and all-tracker query both collapse
      "https://ex.com?gclid=1" -> "https://ex.com/")
    cases.foreach { case (in, want) =>
      val got = one(in).select(Web.normalizeUrl(col("url"))).as[String].head()
      assert(got === want, s"for $in")
    }
  }

  test("domainCap keeps at most cap rows per registered domain") {
    val df = (0L until 40L).map(i =>
        (i, s"https://www.dom${i % 4}.com/p$i")).toDF("doc_id", "url")
    val kept = Web.domainCap(df, "url", "doc_id", cap = 3)
    assert(kept.count() === 12)
    val perDom = kept.groupBy("reg_domain").count().as[(String, Long)]
      .collect().toMap
    assert(perDom.values.forall(_ === 3L) && perDom.size === 4)
    // deterministic: same priorities on a rerun
    val again = Web.domainCap(df, "url", "doc_id", cap = 3)
      .select("doc_id").as[Long].collect().sorted
    assert(again === kept.select("doc_id").as[Long].collect().sorted)
  }

  test("blocklistFilter drops exactly the blocked registered domains") {
    val df = (0L until 20L).map(i =>
        (i, s"https://cdn.dom${i % 4}.co.uk/p")).toDF("doc_id", "url")
    val kept = Web.blocklistFilter(df, "url", Seq("dom1.co.uk", "dom3.co.uk"))
    assert(kept.count() === 10)
    assert(kept.select("reg_domain").distinct().as[String].collect().toSet
      === Set("dom0.co.uk", "dom2.co.uk"))
  }

  test("sitemapUrls parses url blocks with optional fields") {
    val xml =
      """<?xml version="1.0"?><urlset>
        |<url><loc> https://h.com/a </loc><lastmod>2026-01-02</lastmod>
        | <priority>0.8</priority></url>
        |<url><loc>https://h.com/b</loc></url>
        |</urlset>""".stripMargin
    val got = Web.sitemapUrls(Seq(("h", xml)).toDF("host", "xml"), "xml")
      .select("loc", "lastmod", "priority")
      .as[(String, Option[String], Option[Double])].collect().toSeq
    assert(got === Seq(
      ("https://h.com/a", Some("2026-01-02"), Some(0.8)),
      ("https://h.com/b", None, None)))
  }

  test("sitemapUrls never reads a field from a neighboring block") {
    val xml = "<url><loc>/a</loc></url><url><lastmod>2026-02-02" +
      "</lastmod><loc>/b</loc></url>"
    val got = Web.sitemapUrls(Seq(("h", xml)).toDF("host", "xml"), "xml")
      .select("loc", "lastmod").as[(String, Option[String])]
      .collect().toSeq
    assert(got === Seq(("/a", None), ("/b", Some("2026-02-02"))))
  }

  test("sitemapIndex parses sitemap blocks with optional lastmod") {
    val xml = "<sitemapindex><sitemap><loc> https://h.com/a.xml </loc>" +
      "<lastmod>2026-01-01</lastmod></sitemap>" +
      "<sitemap><loc>https://h.com/b.xml</loc></sitemap></sitemapindex>"
    val got = Web.sitemapIndex(Seq(("h", xml)).toDF("host", "xml"), "xml")
      .select("child_loc", "child_lastmod")
      .as[(String, Option[String])].collect().toSeq
    assert(got === Seq(
      ("https://h.com/a.xml", Some("2026-01-01")),
      ("https://h.com/b.xml", None)))
  }

  test("frontierSchedule: per-host md5-ordered slots, offset = slot " +
      "x delay with the default where the host declares none") {
    val df = Seq(
      ("https://a.com/1", Some(3.0)), ("https://a.com/2", Some(3.0)),
      ("https://a.com/3", Some(3.0)), ("https://b.com/1", None))
      .toDF("url", "delay")
    val got = Web.frontierSchedule(df, "url", "delay",
        defaultDelaySec = 1.5)
      .select("url", "fetch_slot", "fetch_offset_s")
      .as[(String, Int, Double)].collect()
    val aSlots = got.filter(_._1.startsWith("https://a.com"))
      .map(r => (r._2, r._3)).sortBy(_._1).toSeq
    assert(aSlots === Seq((0, 0.0), (1, 3.0), (2, 6.0)))
    assert(got.find(_._1 == "https://b.com/1").get._2 === 0)
    assert(got.find(_._1 == "https://b.com/1").get._3 === 0.0)
    // deterministic: the slot order is md5(url), not input order
    val expected = Seq("https://a.com/1", "https://a.com/2",
      "https://a.com/3").sortBy(u => (java.security.MessageDigest
        .getInstance("MD5").digest(u.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, u))
    val bySlot = got.filter(_._1.startsWith("https://a.com"))
      .sortBy(_._2).map(_._1).toSeq
    assert(bySlot === expected)
  }

  private val robotsBody =
    """# welcome
      |User-Agent: GraftBot
      |Disallow: /private/   # inline comment
      |Allow: /private/pub/
      |
      |User-agent: *
      |disallow: /blog/
      |User-agent: evilbot
      |Disallow: /
      |""".stripMargin

  test("parseRobots attributes directives to groups, drops noise") {
    val rules = Web.parseRobots(
        Seq(("h.com", robotsBody)).toDF("host", "robots"),
        "host", "robots")
      .select("agent", "rule", "prefix").as[(String, String, String)]
      .collect().toSet
    assert(rules === Set(
      ("graftbot", "agent", ""),
      ("*", "agent", ""),
      ("evilbot", "agent", ""),
      ("graftbot", "disallow", "/private/"),
      ("graftbot", "allow", "/private/pub/"),
      ("*", "disallow", "/blog/"),
      ("evilbot", "disallow", "/")))
  }

  test("parseRobots ignores directives before any user-agent line") {
    val rules = Web.parseRobots(
        Seq(("h.com", "Disallow: /x\nUser-agent: *\nDisallow: /y\n"))
          .toDF("host", "robots"), "host", "robots")
      .filter($"rule" =!= "agent")
      .select("prefix").as[String].collect().toSeq
    assert(rules === Seq("/y"))
  }

  test("parseRobots stacks consecutive user-agent lines into one " +
      "group (RFC 9309 §2.2), blank lines not splitting the run") {
    val body = "User-agent: a\n\nUser-agent: b\nDisallow: /x\n" +
      "User-agent: c\nAllow: /y\n"
    val rules = Web.parseRobots(
        Seq(("h.com", body)).toDF("host", "robots"), "host", "robots")
      .select("agent", "rule", "prefix").as[(String, String, String)]
      .collect().toSet
    assert(rules === Set(
      ("a", "agent", ""), ("b", "agent", ""), ("c", "agent", ""),
      ("a", "disallow", "/x"), ("b", "disallow", "/x"),
      ("c", "allow", "/y")))
  }

  test("parseRobots keeps a marker row for a rule-less trailing group " +
      "and parses crawl-delay") {
    val body = "User-agent: *\nDisallow: /z\nCrawl-delay: 4\n" +
      "User-agent: graftbot\n"
    val rules = Web.parseRobots(
        Seq(("h.com", body)).toDF("host", "robots"), "host", "robots")
      .select("agent", "rule", "prefix").as[(String, String, String)]
      .collect().toSet
    assert(rules === Set(
      ("*", "agent", ""), ("graftbot", "agent", ""),
      ("*", "disallow", "/z"), ("*", "crawl-delay", "4")))
  }

  test("an empty-path directive terminates a header run but imposes " +
      "no rule") {
    // 'Disallow:' between the two UA lines is a rule line per the
    // grammar, so b starts a NEW group — a must not get /x
    val body = "User-agent: a\nDisallow:\nUser-agent: b\nDisallow: /x\n"
    val rules = Web.parseRobots(
        Seq(("h.com", body)).toDF("host", "robots"), "host", "robots")
      .select("agent", "rule", "prefix").as[(String, String, String)]
      .collect().toSet
    assert(rules === Set(
      ("a", "agent", ""), ("b", "agent", ""),
      ("b", "disallow", "/x")))
  }

  test("robotsAllowed: longest match, allow-wins tie, group shadowing") {
    val rules = Web.parseRobots(
      Seq(("h.com", robotsBody)).toDF("host", "robots"),
      "host", "robots")
    val urls = Seq(
      (1L, "https://h.com/private/secret"),   // disallow /private/
      (2L, "https://h.com/private/pub/ok"),   // longer allow wins
      (3L, "https://h.com/blog/x"),           // '*' rule shadowed
      (4L, "https://h.com/open"),             // no match -> allowed
      (5L, "https://other.com/private/x")     // no robots -> allowed
    ).toDF("doc_id", "url")
    val got = Web.robotsAllowed(urls, "url", rules, "graftbot")
      .select("doc_id", "allowed").as[(Long, Boolean)].collect().toMap
    assert(got === Map(1L -> false, 2L -> true, 3L -> true,
      4L -> true, 5L -> true))
  }

  test("robotsAllowed falls back to the '*' group without a specific") {
    val rules = Web.parseRobots(
      Seq(("h.com", "User-agent: *\nDisallow: /blog/\n"))
        .toDF("host", "robots"), "host", "robots")
    val got = Web.robotsAllowed(
        Seq((1L, "https://h.com/blog/p"), (2L, "https://h.com/ok"))
          .toDF("doc_id", "url"), "url", rules, "graftbot")
      .select("doc_id", "allowed").as[(Long, Boolean)].collect().toMap
    assert(got === Map(1L -> false, 2L -> true))
  }

  test("robotsAllowed: an EMPTY specific group shadows '*' — the RFC " +
      "9309 shape the r7 property suite falsified") {
    // '*' disallows /b/y, graftbot's group has zero directives; RFC
    // 9309 §2.2.1: the specific group, even empty, governs → allowed
    val body = "User-agent: *\nDisallow: /b/y\nUser-agent: graftbot\n"
    val rules = Web.parseRobots(
      Seq(("h.com", body)).toDF("host", "robots"), "host", "robots")
    val got = Web.robotsAllowed(
        Seq((1L, "https://h.com/b/y"), (2L, "https://h.com/ok"))
          .toDF("doc_id", "url"), "url", rules, "graftbot")
      .select("doc_id", "allowed").as[(Long, Boolean)].collect().toMap
    assert(got === Map(1L -> true, 2L -> true))
  }

  test("robotsAllowed: stacked header rules bind to every named agent") {
    val body = "User-agent: graftbot\nUser-agent: *\nDisallow: /x\n"
    val rules = Web.parseRobots(
      Seq(("h.com", body)).toDF("host", "robots"), "host", "robots")
    val got = Web.robotsAllowed(
        Seq((1L, "https://h.com/x"), (2L, "https://h.com/y"))
          .toDF("doc_id", "url"), "url", rules, "graftbot")
      .select("doc_id", "allowed").as[(Long, Boolean)].collect().toMap
    assert(got === Map(1L -> false, 2L -> true))
  }

  test("parseRobots dedupes a repeated agent name within one header " +
      "run — directives are never doubled") {
    val body = "User-agent: a\nUser-agent: a\nDisallow: /x\n"
    val rules = Web.parseRobots(
        Seq(("h.com", body)).toDF("host", "robots"), "host", "robots")
      .select("agent", "rule", "prefix").as[(String, String, String)]
      .collect().toSeq
    assert(rules.sorted === Seq(
      ("a", "agent", ""), ("a", "disallow", "/x")))
  }

  test("robotsSitemaps extracts group-independent Sitemap lines; " +
      "parseRobots neither scopes nor breaks on them") {
    val body = "Sitemap: https://h.com/a.xml\nUser-agent: a\n" +
      "Sitemap: https://h.com/b.xml  # comment\nUser-agent: b\n" +
      "Disallow: /x\n"
    val sm = Web.robotsSitemaps(
        Seq(("h.com", body)).toDF("host", "robots"), "host", "robots")
      .select("sitemap_url").as[String].collect().toSet
    assert(sm === Set("https://h.com/a.xml", "https://h.com/b.xml"))
    // the sitemap line between the two UA lines must NOT split the
    // stacked header: /x belongs to both a and b
    val rules = Web.parseRobots(
        Seq(("h.com", body)).toDF("host", "robots"), "host", "robots")
      .filter($"rule" === "disallow")
      .select("agent").as[String].collect().toSet
    assert(rules === Set("a", "b"))
  }

  test("robotsAllowed matches RFC 9309 §2.2.3 wildcard and end-anchor " +
      "patterns, plain prefixes still win by pattern length") {
    val body = "User-agent: graftbot\nDisallow: /d/*.pdf$\n" +
      "Disallow: /a$\nAllow: /d/pub*.pdf$\nDisallow: /*ssn\n"
    val rules = Web.parseRobots(
      Seq(("h.com", body)).toDF("host", "robots"), "host", "robots")
    val got = Web.robotsAllowed(Seq(
        (1L, "https://h.com/d/x.pdf"),    // wildcard+anchor -> deny
        (2L, "https://h.com/d/x.pdfz"),   // dodges the $ anchor
        (3L, "https://h.com/a"),          // exact /a$ -> deny
        (4L, "https://h.com/a/b"),        // /a$ anchored: allowed
        (5L, "https://h.com/d/pub1.pdf"), // longer allow pattern wins
        (6L, "https://h.com/x/ssn"),      // leading-* wildcard -> deny
        (7L, "https://h.com/ok")
      ).toDF("doc_id", "url"), "url", rules, "graftbot")
      .select("doc_id", "allowed").as[(Long, Boolean)].collect().toMap
    assert(got === Map(1L -> false, 2L -> true, 3L -> false,
      4L -> true, 5L -> true, 6L -> false, 7L -> true))
  }

  test("robotsAllowed matches rules against path + '?' + query " +
      "(RFC 9309 §2.2.2), not the path alone") {
    val body = "User-agent: graftbot\nDisallow: /*?sid=\n" +
      "Disallow: /q\nAllow: /q?sid=pub$\n"
    val rules = Web.parseRobots(
      Seq(("h.com", body)).toDF("host", "robots"), "host", "robots")
    val got = Web.robotsAllowed(Seq(
        (1L, "https://h.com/p"),             // no query
        (2L, "https://h.com/p?sid=9"),       // wildcard query rule hits
        (3L, "https://h.com/p?x=1&sid=9"),   // no '?sid=' octet run
        (4L, "https://h.com/q?other=1"),     // plain /q prefix through ?
        (5L, "https://h.com/q?sid=pub"),     // anchored allow out-ranks
        (6L, "https://h.com/q?sid=pub2")     // dodges the $ anchor
      ).toDF("doc_id", "url"), "url", rules, "graftbot")
      .select("doc_id", "allowed").as[(Long, Boolean)].collect().toMap
    assert(got === Map(1L -> true, 2L -> false, 3L -> true,
      4L -> false, 5L -> true, 6L -> false))
  }

  test("robotsAllowed reports the SELECTED group's crawl-delay, " +
      "shadowing the '*' delay when a specific group exists") {
    val body = "User-agent: *\nCrawl-delay: 10\nDisallow: /b\n" +
      "User-agent: graftbot\nDisallow: /p\nCrawl-delay: 3\n"
    val rules = Web.parseRobots(
      Seq(("h.com", body), ("g.com", "User-agent: *\nCrawl-delay: 7\n"))
        .toDF("host", "robots"), "host", "robots")
    val got = Web.robotsAllowed(
        Seq((1L, "https://h.com/ok"), (2L, "https://g.com/ok"),
          (3L, "https://nobots.com/ok")).toDF("doc_id", "url"),
        "url", rules, "graftbot")
      .select("doc_id", "crawl_delay")
      .as[(Long, Option[Double])].collect().toMap
    assert(got === Map(1L -> Some(3.0), 2L -> Some(7.0), 3L -> None))
  }
}
