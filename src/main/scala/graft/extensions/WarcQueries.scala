package graft.extensions

import org.apache.spark.sql.functions._
import graft.Q
import graft.operators.{Html, Warc}
import graft.tables.Tables.documents

/** Driver-checked queries for WARC ingestion
  * ([[graft.operators.Warc]]).
  *
  * Oracle pattern (as the URL/HTML/MP3 gates): each doc synthesizes a
  * REAL two-record WARC body (request + response, true CRLF framing,
  * Content-Length computed from the actual record blocks, a 404 branch)
  * and the engine runs its actual record splitter and HTTP parser over
  * those bytes. The DuckDB oracle never parses WARC: it reconstructs
  * the record blocks from the same arithmetic and re-derives every
  * header field and length, so any defect in record splitting, header
  * extraction, separator stripping, or HTTP payload slicing breaks the
  * hash compare.
  */
private[graft] object WarcQueries {

  private def s(c: org.apache.spark.sql.Column) = c.cast("string")

  private def warcDocs(sp: org.apache.spark.sql.SparkSession,
                       dir: String) = {
    val id = col("doc_id")
    val k = s(pmod(id, lit(20)))
    val q = s(pmod(id, lit(11)))
    val a = s(pmod(id, lit(40)))
    val nf = pmod(id, lit(13)) === 0
    val uri = concat(lit("https://site"), k, lit(".com/p"), q)
    val req = concat(lit("GET /p"), q, lit(" HTTP/1.1"))
    val payload = when(nf, lit("<html><body>missing</body></html>"))
      .otherwise(concat(lit("<html><title>Doc "), a,
        lit("</title><body>Doc "), a, lit(" body</body></html>")))
    val resp = concat(lit("HTTP/1.1 "),
      when(nf, lit("404 Not Found")).otherwise(lit("200 OK")),
      lit("\r\nContent-Type: text/html\r\n\r\n"), payload)
    val content = concat(
      lit("WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: "), uri,
      lit("\r\nContent-Length: "), s(length(req)),
      lit("\r\n\r\n"), req, lit("\r\n\r\n"),
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "), uri,
      lit("\r\nContent-Length: "), s(length(resp)),
      lit("\r\n\r\n"), resp, lit("\r\n\r\n"))
    documents(sp, dir).select(id, content.as("warc"))
  }

  /** Oracle CTE reconstructing the request/response blocks. */
  private val oracleBlocks: String =
    """b AS (SELECT doc_id,
      |  'https://site' || CAST(doc_id % 20 AS VARCHAR) || '.com/p' ||
      |   CAST(doc_id % 11 AS VARCHAR) AS uri,
      |  'GET /p' || CAST(doc_id % 11 AS VARCHAR) || ' HTTP/1.1' AS req,
      |  'HTTP/1.1 ' ||
      |  (CASE WHEN doc_id % 13 = 0 THEN '404 Not Found'
      |    ELSE '200 OK' END) ||
      |  chr(13) || chr(10) || 'Content-Type: text/html' ||
      |  chr(13) || chr(10) || chr(13) || chr(10) ||
      |  (CASE WHEN doc_id % 13 = 0
      |    THEN '<html><body>missing</body></html>'
      |    ELSE '<html><title>Doc ' || CAST(doc_id % 40 AS VARCHAR) ||
      |     '</title><body>Doc ' || CAST(doc_id % 40 AS VARCHAR) ||
      |     ' body</body></html>' END) AS resp
      | FROM documents)""".stripMargin

  val all: Seq[Q] = Seq(

    // Record split + WARC header lift out of the real parser vs the
    // reconstructed blocks: per-record type, target URI, declared
    // length, and the declared-vs-actual integrity bit.
    Q("ext_warc_parse",
      s"""WITH $oracleBlocks
         |SELECT doc_id, CAST(0 AS INT) AS rec_idx,
         | 'request' AS warc_type, uri AS target_uri,
         | CAST(length(req) AS BIGINT) AS content_length, TRUE AS len_ok
         |FROM b
         |UNION ALL
         |SELECT doc_id, 1, 'response', uri,
         | CAST(length(resp) AS BIGINT), TRUE
         |FROM b
         |ORDER BY doc_id, rec_idx""".stripMargin) { (sp, dir) =>
      Warc.warcRecords(warcDocs(sp, dir), "warc")
        .select(col("doc_id"), col("rec_idx"), col("warc_type"),
          col("target_uri"), col("content_length"), col("len_ok"))
        .orderBy(col("doc_id"), col("rec_idx"))
    },

    // The full Common Crawl ingestion chain — WARC records → HTTP
    // response split → HTML visible text — every stage the real
    // operator, the oracle in closed form.
    Q("ext_warc_text",
      """SELECT doc_id,
        | CAST(CASE WHEN doc_id % 13 = 0 THEN 404 ELSE 200 END AS INT)
        |  AS http_status,
        | 'text/html' AS content_type,
        | CASE WHEN doc_id % 13 = 0 THEN 'missing'
        |  ELSE 'Doc ' || CAST(doc_id % 40 AS VARCHAR) || ' Doc ' ||
        |   CAST(doc_id % 40 AS VARCHAR) || ' body' END AS text
        |FROM documents ORDER BY doc_id""".stripMargin) { (sp, dir) =>
      val recs = Warc.warcRecords(warcDocs(sp, dir), "warc")
        .filter(col("warc_type") === "response")
      Warc.httpResponse(recs, "body")
        .select(col("doc_id"), col("http_status"), col("content_type"),
          Html.htmlToText(col("payload")).as("text"))
        .orderBy(col("doc_id"))
    })
}
