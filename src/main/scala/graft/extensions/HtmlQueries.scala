package graft.extensions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.Q
import graft.operators.{Graph, Html, Web}
import graft.tables.Tables.documents

/** Driver-checked queries for HTML text extraction
  * ([[graft.operators.Html]]).
  *
  * Oracle pattern (as the multimodal and URL gates): each doc
  * synthesizes a REAL HTML document from doc_id arithmetic — head
  * with title and a style block, comments, mixed-case tags,
  * attributes, character entities (including a double-escaped one), a
  * script block containing both a bare `<` and a quoted `"</p>"`, and
  * 1–2 anchors (absolute + relative) — and the engine runs its actual
  * regex extraction over that markup. The DuckDB oracle never touches
  * HTML: it re-derives the expected visible text, title and link list
  * from the same arithmetic, so any defect in block removal, tag
  * stripping, entity decode order, or whitespace collapse breaks the
  * hash compare.
  */
private[graft] object HtmlQueries {

  private def s(c: Column): Column = c.cast("string")

  /** Synthetic HTML document for one doc_id. Visible text must come
    * out EXACTLY as: `Doc A Head B para "C" & <raw D' rel?> link E
    * [rel F] tail G footer` (see oracle text below).
    */
  private def syntheticHtml(id: Column): Column = {
    val a = s(pmod(id, lit(40)))
    val b = s(pmod(id, lit(7)))
    val c = s(pmod(id, lit(5)))
    val d = s(pmod(id, lit(9)))
    val p = s(pmod(id, lit(11)))
    val r = s(pmod(id, lit(6)))
    val g = s(pmod(id, lit(13)))
    val h1 = when(pmod(id, lit(2)) === 0,
      concat(lit("<h1 class=\"x\">Head "), b, lit("</h1>")))
      .otherwise(concat(lit("<H1>Head "), b, lit("</H1>")))
    val script = when(pmod(id, lit(2)) === 0,
      lit("<script type=\"text/javascript\">if (1 < 2) { var x = \"</p>\"; }</script>"))
      .otherwise(lit(""))
    val rel = when(pmod(id, lit(4)) === 0,
      concat(lit("<a href='/rel"), r, lit("'>rel</a> ")))
      .otherwise(lit(""))
    concat(
      lit("<html><!-- comment "), s(pmod(id, lit(3))), lit(" -->"),
      lit("<head><title>Doc "), a, lit("</title>"),
      lit("<style>p { color: red; }</style></head>\n<body>\n"),
      h1, lit("\n"),
      lit("<p>para &quot;"), c, lit("&quot; &amp; &amp;lt; more</p>\n"),
      lit("<a href=\"https://ref"), d, lit(".com/p"), p,
      lit("\">link "), d, lit("</a> "), rel,
      script,
      lit("\n<P>tail "), g, lit("</P>&nbsp;footer\n</body></html>"))
  }

  private def htmlDocs(sp: org.apache.spark.sql.SparkSession, dir: String) =
    documents(sp, dir).select(col("doc_id"),
      syntheticHtml(col("doc_id")).as("html"))

  val all: Seq[Q] = Seq(

    // Image–text pair mining (the LAION recipe): REAL <img> markup —
    // free attribute order, both quote styles, self-closing and plain
    // tags, missing src/alt, an entity in the alt text — through the
    // real extractor; the oracle re-derives every (doc, idx, src, alt)
    // row arithmetically, with the entity already decoded.
    Q("ext_html_images",
      """WITH i AS (SELECT doc_id, r.i FROM documents, range(2) r(i)
        |  WHERE r.i < doc_id % 3)
        |SELECT doc_id, CAST(i AS INT) AS img_idx,
        | CASE WHEN (doc_id + i) % 7 = 0 THEN ''
        |  ELSE 'https://img.example/i' || CAST(doc_id % 50 AS VARCHAR)
        |   || '_' || CAST(i AS VARCHAR) || '.jpg' END AS src,
        | CASE WHEN (doc_id + i) % 2 = 0
        |  THEN 'Pic & no. ' || CAST(doc_id % 7 AS VARCHAR)
        |  ELSE '' END AS alt
        |FROM i ORDER BY doc_id, img_idx""".stripMargin) { (sp, dir) =>
      val id = col("doc_id")
      val n = pmod(id, lit(3))
      val idxs = when(n > 0, sequence(lit(0L), n - 1))
        .otherwise(array().cast("array<bigint>"))
      val tags = transform(idxs, i => {
        val qo = when(pmod(id, lit(2)) === 0, lit("\""))
          .otherwise(lit("'"))
        val srcAttr = when(pmod(id + i, lit(7)) === 0, lit(""))
          .otherwise(concat(lit(" src="), qo,
            lit("https://img.example/i"), s(pmod(id, lit(50))),
            lit("_"), s(i), lit(".jpg"), qo))
        val altAttr = when(pmod(id + i, lit(2)) === 0,
          concat(lit(" alt="), qo, lit("Pic &amp; no. "),
            s(pmod(id, lit(7))), qo)).otherwise(lit(""))
        val attrs = when(pmod(i, lit(2)) === 0,
          concat(srcAttr, altAttr)).otherwise(concat(altAttr, srcAttr))
        // decoy attribute whose VALUE is src=-shaped text, placed
        // before the real attributes: a first-match src extractor
        // (instead of a left-to-right attribute scan) reads the evil
        // URL and breaks the hash compare
        val decoy = when(pmod(id + i, lit(5)) === 0,
          lit(" title=\"go src='https://evil/t.jpg' end\""))
          .otherwise(lit(""))
        concat(lit("<img"), decoy, attrs,
          when(pmod(id + i, lit(3)) === 0, lit(" />"))
            .otherwise(lit(">")))
      })
      val html = concat(lit("<p>before</p>\n"), array_join(tags, "\n"),
        lit("\n<p>after</p>"))
      documents(sp, dir).select(id, html.as("html"))
        .select(id,
          posexplode(Html.htmlImages(col("html")))
            .as(Seq("img_idx", "im")))
        .select(id, col("img_idx").cast("int").as("img_idx"),
          coalesce(col("im.src"), lit("")).as("src"),
          coalesce(col("im.alt"), lit("")).as("alt"))
        .orderBy(id, col("img_idx"))
    },

    // Visible text + title out of the real extractor vs the generator
    // arithmetic. The `&amp;lt;` in the source must surface as the
    // LITERAL text `&lt;` (decode-amp-last), the script block with its
    // quoted "</p>" must vanish entirely, and &nbsp; must collapse
    // into the single space before `footer`.
    Q("ext_html_text",
      """SELECT doc_id,
        | 'Doc ' || CAST(doc_id % 40 AS VARCHAR) AS title,
        | 'Doc ' || CAST(doc_id % 40 AS VARCHAR) ||
        | ' Head ' || CAST(doc_id % 7 AS VARCHAR) ||
        | ' para "' || CAST(doc_id % 5 AS VARCHAR) || '" & &lt; more' ||
        | ' link ' || CAST(doc_id % 9 AS VARCHAR) ||
        | (CASE WHEN doc_id % 4 = 0 THEN ' rel' ELSE '' END) ||
        | ' tail ' || CAST(doc_id % 13 AS VARCHAR) || ' footer'
        |  AS text_plain,
        | CAST(CASE WHEN doc_id % 4 = 0 THEN 2 ELSE 1 END AS INT)
        |  AS n_links
        |FROM documents ORDER BY doc_id""".stripMargin) { (sp, dir) =>
      Html.extract(htmlDocs(sp, dir), "html")
        .select(col("doc_id"), col("title"), col("text_plain"),
          size(col("links")).as("n_links"))
        .orderBy(col("doc_id"))
    },

    // Outlinks in document order, flattened to scalar rows (the
    // compare harness hashes scalars only).
    Q("ext_html_links",
      """SELECT doc_id, idx, href FROM (
        | SELECT doc_id, 0 AS idx,
        |  'https://ref' || CAST(doc_id % 9 AS VARCHAR) || '.com/p' ||
        |   CAST(doc_id % 11 AS VARCHAR) AS href
        | FROM documents
        | UNION ALL
        | SELECT doc_id, 1 AS idx,
        |  '/rel' || CAST(doc_id % 6 AS VARCHAR) AS href
        | FROM documents WHERE doc_id % 4 = 0)
        |ORDER BY doc_id, idx""".stripMargin) { (sp, dir) =>
      htmlDocs(sp, dir)
        .select(col("doc_id"),
          posexplode(Html.htmlLinks(col("html"))).as(Seq("idx", "href")))
        .orderBy(col("doc_id"), col("idx"))
    },

    // Per-target anchor-text aggregation (the link-graph relevance
    // signal): anchors extracted by the real (href, visible-text)
    // parser across the corpus, grouped by target. The oracle
    // re-derives every pair from the generator arithmetic — the
    // absolute link's text 'link {d}' is td-determined so each target
    // must report exactly one distinct text.
    Q("ext_anchor_agg",
      """SELECT href, CAST(count(*) AS BIGINT) AS n_refs,
        | CAST(count(DISTINCT t) AS BIGINT) AS n_texts,
        | min(t) AS anchor
        |FROM (
        | SELECT 'https://ref' || CAST(doc_id % 9 AS VARCHAR) ||
        |   '.com/p' || CAST(doc_id % 11 AS VARCHAR) AS href,
        |  'link ' || CAST(doc_id % 9 AS VARCHAR) AS t
        | FROM documents
        | UNION ALL
        | SELECT '/rel' || CAST(doc_id % 6 AS VARCHAR), 'rel'
        | FROM documents WHERE doc_id % 4 = 0)
        |GROUP BY href ORDER BY href""".stripMargin) { (sp, dir) =>
      htmlDocs(sp, dir)
        .select(explode(Html.htmlAnchors(col("html"))).as("a"))
        .groupBy(col("a.href").as("href"))
        .agg(count(lit(1)).as("n_refs"),
          countDistinct(col("a.text")).as("n_texts"),
          min(col("a.text")).as("anchor"))
        .orderBy(col("href"))
    },

    // The full web-graph chain over REAL extraction: HTML outlinks →
    // absolute-link filter → host parse → registered domain → distinct
    // domain edge list → degree profile. Relative links must NOT
    // become edges, and the target hosts come out of the real
    // parse_url/public-suffix logic; the oracle re-derives the edge
    // list from the anchor-generator arithmetic.
    Q("ext_link_graph",
      """WITH e AS (SELECT DISTINCT
        |  'site' || CAST(doc_id % 20 AS VARCHAR) || '.com' AS src,
        |  'ref' || CAST(doc_id % 9 AS VARCHAR) || '.com' AS dst
        | FROM documents),
        |o AS (SELECT src AS node, count(*) AS od FROM e GROUP BY 1),
        |i AS (SELECT dst AS node, count(*) AS idg FROM e GROUP BY 1)
        |SELECT coalesce(o.node, i.node) AS node,
        | CAST(coalesce(od, 0) AS BIGINT) AS out_deg,
        | CAST(coalesce(idg, 0) AS BIGINT) AS in_deg
        |FROM o FULL JOIN i ON o.node = i.node
        |ORDER BY node""".stripMargin) { (sp, dir) =>
      val edges = htmlDocs(sp, dir)
        .select(concat(lit("site"), s(pmod(col("doc_id"), lit(20))),
          lit(".com")).as("src"),
          explode(Html.htmlLinks(col("html"))).as("href"))
        .filter(startswith(col("href"), lit("https://")))
        .select(col("src"),
          Web.registeredDomain(Web.host(col("href"))).as("dst"))
        .distinct()
      Graph.degrees(edges, "src", "dst").orderBy(col("node"))
    })
}
