package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) record parsing — the Common Crawl ingestion stage
  * ahead of the HTTP/HTML/text pipeline ([[Html]], [[Web]]): split a
  * WARC body into records, lift the WARC headers every curation
  * pipeline keys on (type, target URI, declared length), and split
  * HTTP response records into status/headers/payload.
  *
  * Scale shape: everything is a per-row split + posexplode + narrow
  * regexp projections — no UDF, no shuffle; a 100 TB crawl parses at
  * scan speed next to the reader, and each WARC file's records explode
  * locally (record counts per file are bounded by the 1 GB WARC file
  * convention). Header extraction works on the header BLOCK only, so a
  * payload containing header-like lines can never alias into metadata.
  */
object Warc {

  private val Sep = "\r\n\r\n"

  /** Explode WARC bodies into one row per record: keeps `df`'s
    * columns EXCEPT `contentCol` (which is replaced by the per-record
    * columns) and adds `rec_idx` (0-based, in-file order), `warc_type`,
    * `target_uri` (null on records without one, e.g. warcinfo),
    * `content_length` (the declared header value), `body` (the record
    * block with the trailing record-separator CRLFs stripped) and
    * `len_ok` (declared length == actual body OCTET length — WARC
    * Content-Length counts bytes, so multi-byte UTF-8 bodies compare
    * correctly — the integrity check a loader filters on).
    *
    * `contentCol` must start with its first `WARC/1.0` version line
    * (the WARC grammar — records are self-delimiting from offset 0).
    * Record boundaries are found by the version-line delimiter rather
    * than Content-Length byte slicing, so a payload that itself
    * contains a `WARC/1.0` line mis-splits (it then fails the
    * `len_ok` check, which is the filter loaders apply anyway).
    */
  def warcRecords(df: DataFrame, contentCol: String): DataFrame = {
    val recs = df.select(df.columns.map(col) :+
      posexplode(split(col(contentCol), "WARC/1\\.0\r\n"))
        .as(Seq("__i", "__rec")): _*)
      .filter(col("__i") >= 1)
      .withColumn("rec_idx", (col("__i") - 1).cast("int"))
    val header = substring_index(col("__rec"), Sep, 1)
    val rawBody = col("__rec")
      .substr(length(header) + lit(5), length(col("__rec")))
    val body = regexp_replace(rawBody, "(\\r\\n)+$", "")
    recs
      .withColumn("warc_type",
        regexp_extract(header, "(?m)^WARC-Type:\\s*(\\S+)", 1))
      .withColumn("target_uri",
        nullif(regexp_extract(header,
          "(?m)^WARC-Target-URI:\\s*(\\S+)", 1), lit("")))
      .withColumn("content_length",
        regexp_extract(header, "(?m)^Content-Length:\\s*(\\d+)", 1)
          .cast("long"))
      .withColumn("body", body)
      .withColumn("len_ok",
        length(encode(body, "UTF-8")) === col("content_length"))
      .drop("__i", "__rec", contentCol)
  }

  /** Split HTTP response bodies (`bodyCol`, as produced by
    * [[warcRecords]] for `warc_type = response`) into `http_status`,
    * `content_type` (null when absent) and `payload` (everything after
    * the header/payload blank line — the bytes the HTML pipeline
    * consumes). Rows whose body carries no HTTP status line report
    * null status and the full body as payload.
    */
  def httpResponse(df: DataFrame, bodyCol: String): DataFrame = {
    val b = col(bodyCol)
    val status = nullif(
      regexp_extract(b, "^HTTP/1\\.[01]\\s+(\\d{3})", 1), lit(""))
    val header = substring_index(b, Sep, 1)
    val payload = when(status.isNull, b)
      .otherwise(b.substr(length(header) + lit(5), length(b)))
    df.withColumn("http_status", status.cast("int"))
      .withColumn("content_type",
        when(status.isNull, lit(null).cast("string"))
          .otherwise(nullif(regexp_extract(header,
            "(?m)^Content-Type:\\s*([^\\r\\n;]+)", 1), lit(""))))
      .withColumn("payload", payload)
  }
}
