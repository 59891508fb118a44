package graft.serve

import graft.SparkSpec
import graft.streaming.{DauPipeline, LogSplit, Sinks}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Smoke of the HTTP serving layer: fixture serving tables → ServingMain
  * endpoints over a real socket → reference-shaped JSON responses.
  */
class ServingMainSpec extends SparkSpec {
  import spark.implicits._

  private def get(port: Int, pathAndQuery: String): String = {
    val url = java.net.URI.create(s"http://127.0.0.1:$port$pathAndQuery")
      .toURL
    val in = url.openStream()
    try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  test("three endpoints answer from the serving tables") {
    val root = Files.createTempDirectory("serving_main").toString
    // DAU fixture: two actives on 2023-11-14, one on -15 (hr 1)
    val day0 = 1699920000000L
    def logLine(mid: String, uid: String, ts: Long) =
      s"""{"common":{"ar":"110000","ba":"b","ch":"c","is_new":"1","md":"m","mid":"$mid","os":"o","uid":"$uid","vc":"v"},"page":{"during_time":1000,"item":"1","item_type":"sku_id","last_page_id":null,"page_id":"home","source_type":"s"},"ts":$ts}"""
    val dau = DauPipeline.dedupDaily(DauPipeline.sessionStarts(
      LogSplit.pages(LogSplit.parse(Seq(
        logLine("m1", "1", day0 + 3600000),
        logLine("m2", "2", day0 + 7200000),
        logLine("m1", "1", day0 + 86400000L + 3600000)
      ).toDF("value")))))
    Sinks.upsertBatch(dau, s"$root/dau", "mid")
    // order-wide fixture
    Sinks.upsertBatch(Seq(
      (1L, "red widget deluxe", "F", 25, 10.0, "2024-01-05"),
      (2L, "red widget", "M", 31, 20.0, "2024-01-05"),
      (3L, "blue gadget", "F", 19, 30.0, "2024-01-05"))
      .toDF("detail_id", "sku_name", "user_gender", "user_age",
        "split_total_amount", "dt"),
      s"$root/ow", "detail_id")

    val server = ServingMain.start(spark, s"$root/dau", s"$root/ow", 0)
    val port = server.getAddress.getPort
    try {
      // the hour axis is the full-outer join of both days (hr 2 had
      // traffic only yesterday → dauTd 0 there)
      val dauJson = get(port, "/dauRealtime?td=2023-11-15")
      assert(dauJson == """{"dauTotal":1,"dauTd":{"1":1,"2":0},"dauYd":{"1":1,"2":1}}""")

      val stats = get(port,
        "/statsByItem?itemName=red+widget&date=2024-01-05&t=gender")
      assert(stats == """[{"name":"女","value":10.0},{"name":"男","value":20.0}]""")

      val detail = get(port,
        "/detailByItem?date=2024-01-05&itemName=widget&pageNo=1&pageSize=1")
      assert(detail.startsWith("""{"total":2,"detail":["""))
      assert(detail.contains("red <em>widget</em> deluxe"))

      // a page past the last row still reports the true total
      val past = get(port,
        "/detailByItem?date=2024-01-05&itemName=widget&pageNo=99&pageSize=1")
      assert(past == """{"total":2,"detail":[]}""")

      // bad param → 400 with a JSON error, not a hung socket
      val bad = java.net.URI.create(
        s"http://127.0.0.1:$port/statsByItem?itemName=x&date=2024-01-05&t=nope")
        .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(bad.getResponseCode == 400)
      bad.disconnect()
      // missing required param (Map.apply) is also the caller's fault
      val missing = java.net.URI.create(
        s"http://127.0.0.1:$port/dauRealtime")
        .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(missing.getResponseCode == 400)
      missing.disconnect()
    } finally server.stop(0)
  }

  test("server-side failures return 500 without leaking internals") {
    val root = Files.createTempDirectory("serving_500").toString
    // point the server at store paths that do not exist: a query is a
    // genuine server-side failure (AnalysisException), not a caller bug
    val server = ServingMain.start(spark, s"$root/nope_dau",
      s"$root/nope_ow", 0)
    val port = server.getAddress.getPort
    try {
      val c = java.net.URI.create(
        s"http://127.0.0.1:$port/dauRealtime?td=2024-01-05")
        .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(c.getResponseCode == 500)
      val body = new String(c.getErrorStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      assert(body == """{"error":"internal server error"}""")
      c.disconnect()
    } finally server.stop(0)
  }
}
