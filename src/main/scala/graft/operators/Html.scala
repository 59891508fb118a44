package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** HTML → text extraction — the step that turns crawled markup into
  * trainable text (the WET-extraction stage ahead of every quality /
  * dedup operator in this engine). Heuristic, regex-based main-content
  * extraction in the C4 tradition: script/style/comment blocks go
  * first (their content is code, not prose), then tags, then character
  * entities, then whitespace collapse.
  *
  * Everything is a narrow per-row projection over codegen'd
  * `regexp_replace`/`regexp_extract_all` builtins — no UDF, no
  * shuffle; at 100 TB this runs at scan speed next to the parquet
  * reader, which is exactly where an extraction pass must sit.
  */
object Html {

  /** Named character entities [[htmlToText]] decodes (the set that
    * dominates real-world corpora); `&amp;` is decoded LAST so
    * double-escaped text cannot alias into markup.
    */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ",
    "&amp;" -> "&")

  /** Visible text of an HTML document: script/style/comment blocks
    * removed, tags stripped, entities decoded, whitespace collapsed
    * and trimmed.
    */
  def htmlToText(html: Column): Column = {
    val noBlocks = regexp_replace(html,
      "(?is)<(script|style)\\b[^>]*>.*?</\\1\\s*>", " ")
    val noComments = regexp_replace(noBlocks, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComments, "(?s)<[^>]+>", " ")
    val decoded = Entities.foldLeft(noTags) { case (c, (ent, ch)) =>
      regexp_replace(c, java.util.regex.Pattern.quote(ent),
        java.util.regex.Matcher.quoteReplacement(ch))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** `<title>` content (first occurrence), entity-decoded and
    * whitespace-collapsed; null when the document has none.
    */
  def htmlTitle(html: Column): Column = {
    val raw = regexp_extract(html, "(?is)<title[^>]*>(.*?)</title\\s*>", 1)
    when(raw === "", lit(null)).otherwise(htmlToText(raw))
  }

  /** All `href` targets of a document, in document order (the
    * outlink list that seeds crawl frontiers and link-graph dedup).
    */
  def htmlLinks(html: Column): Column =
    regexp_extract_all(html, lit("(?i)href\\s*=\\s*[\"']([^\"']*)[\"']"),
      lit(1))

  /** All anchors of a document as `array<struct<href, text>>` in
    * document order — the (target, anchor-text) pairs whose per-target
    * aggregation is the classic link-graph relevance signal. `text` is
    * the anchor's visible text ([[htmlToText]] applied inside the
    * element, so nested markup and entities are handled identically to
    * body text); anchors without an `href` report null. One codegen
    * projection like the rest of this object.
    */
  def htmlAnchors(html: Column): Column = {
    val tags = regexp_extract_all(html,
      lit("(?is)<a\\b[^>]*>.*?</a\\s*>"), lit(0))
    transform(tags, a => struct(
      nullif(regexp_extract(a, "(?i)href\\s*=\\s*[\"']([^\"']*)[\"']", 1),
        lit("")).as("href"),
      htmlToText(regexp_extract(a, "(?is)>(.*?)</a\\s*>", 1)).as("text")))
  }

  /** All `<img>` elements as `array<struct<src, alt>>` in document
    * order — the (image URL, alt text) pairs that seed image–text
    * training corpora (LAION-style pair mining from crawled pages).
    * Attribute order is free, quoting may be `"` or `'`, a missing or
    * empty attribute reports null; alt text is entity-decoded and
    * whitespace-collapsed exactly like body text ([[htmlToText]]). One
    * codegen projection like the rest of this object.
    */
  def htmlImages(html: Column): Column = {
    val tags = regexp_extract_all(html, lit("(?i)<img\\b[^>]*>"),
      lit(0))
    // left-to-right attribute scan: tokenize the tag into name=value
    // units whose values — quoted OR unquoted — are CONSUMED by the
    // match, so src=/alt=-shaped text inside another attribute's
    // quoted value (alt="use src='x'") or inside an unquoted one
    // (onload=f(src="e")) can never be read as the attribute — and
    // data-src / data-alt (lazy-load markup) never alias the real one
    // because the full token name is compared, not a prefix. An
    // unquoted value ends at whitespace or `>`, matching the HTML
    // spec's attribute tokenization, so `onload=f( src="x")` does
    // surface src — exactly as a browser would parse it.
    def attr(t: Column, name: String): Column = {
      val toks = regexp_extract_all(t,
        lit("(?s)[\\w-]+\\s*=\\s*(?:\"[^\"]*\"|'[^']*'|[^\\s>]+)"), lit(0))
      val hits = filter(toks,
        a => lower(regexp_extract(a, "^([\\w-]+)", 1)) === name)
      val body = regexp_extract(get(hits, lit(0)),
        "(?s)^[\\w-]+\\s*=\\s*(.*)$", 1)
      // a body starting with an UNMATCHED quote is a malformed tag
      // (src="x with no closing quote): a browser consumes to end of
      // tag, so surfacing the quote-prefixed fragment as a URL would
      // be wrong either way — report null, like a missing attribute
      when(body.rlike("(?s)^\".*\"$"),
          regexp_extract(body, "(?s)^\"(.*)\"$", 1))
        .when(body.rlike("(?s)^'.*'$"),
          regexp_extract(body, "(?s)^'(.*)'$", 1))
        .when(body.rlike("(?s)^[\"']"), lit(null))
        .otherwise(body)
    }
    transform(tags, t => struct(
      nullif(attr(t, "src"), lit("")).as("src"),
      nullif(htmlToText(attr(t, "alt")), lit("")).as("alt")))
  }

  /** Extraction pass over a corpus: adds `title`, `text_plain` and
    * `links` columns derived from `htmlCol`. One whole-stage-codegen
    * projection.
    */
  def extract(df: DataFrame, htmlCol: String): DataFrame =
    df.withColumn("title", htmlTitle(col(htmlCol)))
      .withColumn("text_plain", htmlToText(col(htmlCol)))
      .withColumn("links", htmlLinks(col(htmlCol)))
}
