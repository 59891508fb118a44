package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private val twoRecords =
    "WARC/1.0\r\n" +
      "WARC-Type: warcinfo\r\n" +
      "Content-Length: 9\r\n" +
      "\r\n" +
      "info body\r\n\r\n" +
      "WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Target-URI: https://x.com/a\r\n" +
      "Content-Length: 53\r\n" +
      "\r\n" +
      "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>Hi</p>\r\n\r\n"

  test("warcRecords splits records and lifts headers") {
    val got = Warc.warcRecords(Seq((1L, twoRecords)).toDF("id", "warc"),
        "warc")
      .select("rec_idx", "warc_type", "target_uri", "content_length")
      .as[(Int, String, Option[String], Long)].collect().toSeq
      .sortBy(_._1)
    assert(got === Seq(
      (0, "warcinfo", None, 9L),
      (1, "response", Some("https://x.com/a"), 53L)))
  }

  test("warcRecords: len_ok flags declared-vs-actual mismatches") {
    val ok = Warc.warcRecords(Seq((1L, twoRecords)).toDF("id", "warc"),
        "warc")
      .select("rec_idx", "len_ok").as[(Int, Boolean)].collect().toMap
    assert(ok === Map(0 -> true, 1 -> true))
    val bad = twoRecords.replace("Content-Length: 9", "Content-Length: 8")
    val got = Warc.warcRecords(Seq((1L, bad)).toDF("id", "warc"), "warc")
      .select("rec_idx", "len_ok").as[(Int, Boolean)].collect().toMap
    assert(got === Map(0 -> false, 1 -> true))
  }

  test("warcRecords keeps payload blank lines inside the body") {
    val rows = Warc.warcRecords(Seq((1L, twoRecords)).toDF("id", "warc"),
        "warc")
      .filter(col("warc_type") === "response")
      .select("body").as[String].head()
    assert(rows ===
      "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>Hi</p>")
  }

  test("httpResponse splits status, content-type and payload") {
    val recs = Warc.warcRecords(Seq((1L, twoRecords)).toDF("id", "warc"),
        "warc")
      .filter(col("warc_type") === "response")
    val r = Warc.httpResponse(recs, "body")
      .select("http_status", "content_type", "payload").head()
    assert(r.getInt(0) === 200)
    assert(r.getString(1) === "text/html")
    assert(r.getString(2) === "<p>Hi</p>")
  }

  test("httpResponse: non-HTTP body reports null status, body as payload") {
    val r = Warc.httpResponse(Seq((1L, "raw bytes")).toDF("id", "body"),
        "body")
      .select("http_status", "content_type", "payload").head()
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(r.getString(2) === "raw bytes")
  }

  test("httpResponse strips charset params from content-type") {
    val r = Warc.httpResponse(
        Seq((1L, "HTTP/1.1 301 Moved\r\nContent-Type: text/html; charset=utf-8\r\n\r\nx"))
          .toDF("id", "body"), "body")
      .select("http_status", "content_type").head()
    assert(r.getInt(0) === 301)
    assert(r.getString(1) === "text/html")
  }
}
