package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def text(html: String): String =
    Seq(html).toDF("h").select(Html.htmlToText(col("h"))).as[String].head()

  test("htmlToText strips tags and collapses whitespace") {
    assert(text("<html><body><p>Hello   <b>world</b></p></body></html>")
      === "Hello world")
  }

  test("htmlToText removes script/style/comment blocks wholesale") {
    assert(text("<style>p{a:1}</style>A<script>var x = '</p>';</script>B" +
      "<!-- gone\nacross lines -->C") === "A B C")
    // case-insensitive closers with whitespace
    assert(text("<SCRIPT>x</SCRIPT >kept") === "kept")
  }

  test("htmlToText decodes entities, &amp; last") {
    assert(text("<p>a &lt;b&gt; &quot;c&quot; &#39;d&#39; e&nbsp;f &amp; g</p>")
      === "a <b> \"c\" 'd' e f & g")
    // double-escaped markup stays literal text
    assert(text("<p>&amp;lt;tag&amp;gt;</p>") === "&lt;tag&gt;")
  }

  test("htmlTitle extracts the first title, null when absent") {
    val df = Seq(
      "<head><title>One  Two</title></head><title>Nope</title>",
      "<head></head>").toDF("h")
    val got = df.select(Html.htmlTitle(col("h"))).as[Option[String]]
      .collect().toSeq
    assert(got === Seq(Some("One Two"), None))
  }

  test("htmlLinks returns hrefs in document order") {
    val got = Seq("""<a href="/a">1</a><img src="x"/><a HREF = 'b.html'>2</a>""")
      .toDF("h").select(Html.htmlLinks(col("h"))).as[Seq[String]].head()
    assert(got === Seq("/a", "b.html"))
  }

  test("htmlAnchors pairs hrefs with entity-decoded visible text") {
    val got = Seq(
        """<a href="/a"><b>Bold</b> &amp; more</a> x <a HREF='b'>2</a>""")
      .toDF("h").select(Html.htmlAnchors(col("h")).as("a"))
      .selectExpr("inline(a)").as[(String, String)].collect().toSeq
    assert(got === Seq(("/a", "Bold & more"), ("b", "2")))
  }

  test("htmlAnchors: anchor without href reports null target") {
    val got = Seq("""<a name="top">here</a>""").toDF("h")
      .select(Html.htmlAnchors(col("h")).as("a"))
      .selectExpr("inline(a)").as[(Option[String], String)].head()
    assert(got === ((None, "here")))
  }

  test("htmlImages: attribute order/quote freedom, missing attrs " +
      "null, alt entity-decoded, data-src never shadows src") {
    val html = "<img src=\"https://h/a.jpg\" alt=\"A &amp; B\">" +
      "<IMG alt='only alt' />" +
      "<img data-src='https://h/lazy.jpg' src='https://h/c.jpg'>" +
      "<img>"
    val got = Seq((1L, html)).toDF("id", "html")
      .select(posexplode(Html.htmlImages($"html")).as(Seq("i", "im")))
      .selectExpr("im.src", "im.alt")
      .as[(Option[String], Option[String])].collect().toSeq
    assert(got === Seq(
      (Some("https://h/a.jpg"), Some("A & B")),
      (None, Some("only alt")),
      (Some("https://h/c.jpg"), None),
      (None, None)))
  }

  test("htmlImages: src=/alt=-shaped text inside another attribute's " +
      "value is never extracted as the attribute") {
    val html =
      "<img title=\"see src='https://evil/a.jpg'\" src='https://h/r.jpg'>" +
        "<img alt=\"use src='x'\">" +
        "<img title='alt=\"ghost\"' src=\"https://h/s.jpg\" alt='real'>"
    val got = Seq((1L, html)).toDF("id", "html")
      .select(posexplode(Html.htmlImages($"html")).as(Seq("i", "im")))
      .selectExpr("im.src", "im.alt")
      .as[(Option[String], Option[String])].collect().toSeq
    assert(got === Seq(
      (Some("https://h/r.jpg"), None),
      (None, Some("use src='x'")),
      (Some("https://h/s.jpg"), Some("real"))))
  }

  test("htmlImages: an unterminated quoted value (malformed tag) " +
      "reports null, never a quote-prefixed URL; unquoted values " +
      "still pass through") {
    val html = "<img src=\"https://h/broken.jpg alt='x'>" +
      "<img src=https://h/bare.jpg>"
    val got = Seq((1L, html)).toDF("id", "html")
      .select(posexplode(Html.htmlImages($"html")).as(Seq("i", "im")))
      .selectExpr("im.src", "im.alt")
      .as[(Option[String], Option[String])].collect().toSeq
    assert(got === Seq(
      (None, Some("x")),
      (Some("https://h/bare.jpg"), None)))
  }

  test("extract adds title, text_plain and links together") {
    val r = Html.extract(
        Seq((7L, "<title>T</title><body><a href='/x'>L</a></body>"))
          .toDF("doc_id", "html"), "html")
      .select("doc_id", "title", "text_plain", "links").head()
    assert(r.getLong(0) === 7L)
    assert(r.getString(1) === "T")
    assert(r.getString(2) === "T L")
    assert(r.getSeq[String](3) === Seq("/x"))
  }
}
