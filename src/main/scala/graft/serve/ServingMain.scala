package graft.serve

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets

/** The reference publisher's user-facing surface (PublisherController
  * .java:26-47) as a dependency-free HTTP main over the serving tables:
  *
  *   GET /dauRealtime?td=yyyy-MM-dd
  *   GET /statsByItem?itemName=...&date=yyyy-MM-dd&t=gender|age
  *   GET /detailByItem?date=yyyy-MM-dd&itemName=...&pageNo=N[&pageSize=M]
  *
  * Query logic lives entirely in [[QueryService]] (the same plans the
  * oracle gate checks); this layer only parses params and shapes JSON —
  * the JDK's built-in HttpServer stands in for Spring Boot, keeping the
  * engine a single artifact with zero web dependencies. Responses
  * mirror the reference's shapes: dauRealtime → {dauTotal, dauTd,
  * dauYd}; statsByItem → [{name, value}] pairs; detailByItem →
  * {total, detail} (the shape PublisherMapperImpl.java:221-223 intends
  * — the reference `return null`s on its success path, SURVEY §7).
  *
  * `main` args: [dauDir, orderWideDir, port(default 8070)].
  */
object ServingMain {

  def main(args: Array[String]): Unit = {
    val Array(dauDir, owDir, portS) = args.padTo(3, "")
    val port = if (portS.isEmpty) 8070 else portS.toInt
    val spark = SparkSession.builder()
      .appName("graft-serving")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER",
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val server = start(spark, dauDir, owDir, port)
    println(s"[serving] listening on port ${server.getAddress.getPort}")
    // the server runs on its own executor; park the main thread
    this.synchronized { this.wait() }
  }

  /** Start the server (port 0 = ephemeral, for tests). */
  def start(spark: SparkSession, dauDir: String, owDir: String,
            port: Int): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/dauRealtime", (ex: HttpExchange) =>
      respond(ex) { p => dauRealtimeJson(spark, dauDir, p("td")) })
    server.createContext("/statsByItem", (ex: HttpExchange) =>
      respond(ex) { p =>
        statsByItemJson(spark, owDir, p("itemName"), p("date"), p("t"))
      })
    server.createContext("/detailByItem", (ex: HttpExchange) =>
      respond(ex) { p =>
        detailByItemJson(spark, owDir, p("itemName"), p("date"),
          p.getOrElse("pageNo", "1").toInt,
          p.getOrElse("pageSize", "20").toInt)
      })
    server.start()
    server
  }

  // ---- response shaping ------------------------------------------------

  private[serve] def dauRealtimeJson(spark: SparkSession, dauDir: String,
                                     td: String): String = {
    val total = QueryService.dauTotal(spark, dauDir, td)
    val hours = QueryService.dauRealtime(spark, dauDir, td).collect()
    def hourMap(f: org.apache.spark.sql.Row => Long) =
      hours.map(r => s"\"${r.getInt(0)}\":${f(r)}").mkString("{", ",", "}")
    s"""{"dauTotal":$total,"dauTd":${hourMap(_.getLong(1))},""" +
      s""""dauYd":${hourMap(_.getLong(2))}}"""
  }

  private[serve] def statsByItemJson(spark: SparkSession, owDir: String,
                                     itemName: String, date: String,
                                     t: String): String = {
    // reference typeToField (PublisherServiceImpl.java:82-86)
    val field = t match {
      case "gender" | "age" => t
      case other => throw new IllegalArgumentException(s"t=$other")
    }
    QueryService.statsByItem(spark, owDir, itemName, date, field)
      .collect()
      .map(r => s"""{"name":${jstr(r.getString(0))},""" +
        s""""value":${r.getDouble(1)}}""")
      .mkString("[", ",", "]")
  }

  private[serve] def detailByItemJson(spark: SparkSession, owDir: String,
                                      itemName: String, date: String,
                                      pageNo: Int, pageSize: Int): String = {
    val page = QueryService.detailByItem(spark, owDir, itemName, date,
      pageNo, pageSize)
    val rows = page.drop("total").toJSON.collect()
    val total =
      if (rows.isEmpty) 0L
      else page.select("total").head().getLong(0)
    s"""{"total":$total,"detail":${rows.mkString("[", ",", "]")}}"""
  }

  // ---- plumbing --------------------------------------------------------

  private def respond(ex: HttpExchange)(
      body: Map[String, String] => String): Unit = {
    val (status, payload) =
      try (200, body(params(ex)))
      catch {
        case e: Throwable =>
          (400, s"""{"error":${jstr(String.valueOf(e.getMessage))}}""")
      }
    val bytes = payload.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type",
      "application/json; charset=utf-8")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def params(ex: HttpExchange): Map[String, String] = {
    val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    q.split("&").filter(_.contains("=")).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      URLDecoder.decode(k, "UTF-8") -> URLDecoder.decode(v, "UTF-8")
    }.toMap
  }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
