package graft.props

import graft.SparkSpec
import graft.operators.{Chat, Fim, Warc, Web}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based invariants for the crawl/SFT operator families:
  * WARC round-trips on generated record sets, FIM reassembly, URL
  * normalization as a fixed point, and chat span slicing on arbitrary
  * conversations. Each property evaluates a whole generated batch in
  * one Spark job to keep runtime sane. (The robots-vs-RFC-9309
  * property lives in [[RobotsProps]], at a higher case count — it is
  * the one that falsified the round-7 group-selection bug.)
  */
object CrawlProps extends Properties("crawl") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(16)

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  // ---- WARC round-trip ---------------------------------------------

  private val bodyChar = Gen.oneOf(('a' to 'z') ++ ('0' to '9') :+ ' ')
  private val bodyGen = for {
    n <- Gen.chooseNum(0, 30)
    cs <- Gen.listOfN(n, bodyChar)
    blank <- Gen.oneOf(true, false)
  } yield {
    val s = cs.mkString
    // internal blank lines allowed; no trailing CR/LF (the record
    // separator would absorb it)
    if (blank && s.length > 4) s.take(2) + "\r\n\r\n" + s.drop(2) else s
  }
  private val recGen = for {
    typ <- Gen.oneOf("request", "response", "warcinfo")
    uri <- Gen.option(Gen.chooseNum(0, 99)
      .map(i => s"https://x.com/p$i"))
    body <- bodyGen
  } yield (typ, uri, body)

  property("warcRecords round-trips generated record sets") =
    Prop.forAll(Gen.chooseNum(1, 4).flatMap(Gen.listOfN(_, recGen))) {
      recs =>
        val content = recs.map { case (typ, uri, body) =>
          "WARC/1.0\r\n" +
            s"WARC-Type: $typ\r\n" +
            uri.map(u => s"WARC-Target-URI: $u\r\n").getOrElse("") +
            s"Content-Length: ${body.length}\r\n" +
            "\r\n" + body + "\r\n\r\n"
        }.mkString
        val got = Warc.warcRecords(
            Seq((1L, content)).toDF("id", "warc"), "warc")
          .select("rec_idx", "warc_type", "target_uri", "body", "len_ok")
          .as[(Int, String, Option[String], String, Boolean)]
          .collect().sortBy(_._1).toSeq
        got.size == recs.size && got.zip(recs).forall {
          case ((_, t2, u2, b2, ok), (t1, u1, b1)) =>
            t2 == t1 && u2 == u1 && b2 == b1 && ok
        }
    }

  // ---- FIM reassembly ----------------------------------------------

  private val textGen = Gen.chooseNum(0, 40)
    .flatMap(n => Gen.listOfN(n, bodyChar)).map(_.mkString)

  property("fimTransform reassembles to the original text") =
    Prop.forAll(Gen.listOfN(6, textGen)) { texts =>
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = Fim.fimTransform(rows.toDF("id", "text"), "id", "text",
          ratePct = 100)
        .select("text", "cut_start", "cut_end", "fim_text")
        .as[(String, Int, Int, String)].collect()
      got.forall { case (text, s, e, fim) =>
        fim == "<PRE>" + text.substring(0, s) + "<SUF>" +
          text.substring(e) + "<MID>" + text.substring(s, e)
      }
    }

  // ---- URL normalization fixed point -------------------------------

  private val urlGen = for {
    scheme <- Gen.oneOf("http", "https", "HTTP")
    host <- Gen.oneOf("A.com", "b.co.uk", "www.C.org")
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    path <- Gen.oneOf("", "/", "/x/y")
    q <- Gen.oneOf("", "?b=2&a=1", "?utm_source=x&a=1", "?fbclid=z")
    frag <- Gen.oneOf("", "#top")
  } yield s"$scheme://$host$port$path$q$frag"

  property("normalizeUrl is a fixed point (idempotent)") =
    Prop.forAll(Gen.listOfN(8, urlGen)) { urls =>
      val df = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
        .toDF("id", "url")
      val once = df.select(col("id"),
        Web.normalizeUrl(col("url")).as("url"))
      val twice = once.select(col("id"),
        Web.normalizeUrl(col("url")).as("n2"),
        col("url"))
      twice.filter(col("n2") =!= col("url")).count() == 0L
    }

  // ---- chat spans slice back on arbitrary conversations ------------

  private val roleGen = Gen.oneOf("system", "user", "assistant")
  private val turnTextGen = Gen.chooseNum(0, 12)
    .flatMap(n => Gen.listOfN(n,
      Gen.oneOf(('a' to 'z') :+ '<' :+ '|' :+ '>' :+ ' ')))
    .map(_.mkString)
  private val convGen = for {
    n <- Gen.chooseNum(1, 6)
    turns <- Gen.listOfN(n, Gen.zip(roleGen, turnTextGen))
  } yield turns

  property("assistantSpans slices exactly on arbitrary conversations") =
    Prop.forAll(Gen.listOfN(3, convGen)) { convs =>
      val rows = convs.zipWithIndex.flatMap { case (turns, c) =>
        turns.zipWithIndex.map { case ((r, t), i) =>
          (c.toLong, i, r, t)
        }
      }
      val df = rows.toDF("conv", "idx", "role", "text")
      val spans = Chat.assistantSpans(df, "conv", "idx", "role", "text")
      val rendered = Chat.renderConversations(df, "conv", "idx", "role",
          "text")
        .select(col("conv"), col("text").as("full"))
      val bad = spans.join(rendered, Seq("conv"))
        .join(df.select(col("conv"), col("idx"),
          col("text").as("turn")), Seq("conv", "idx"))
        .filter(
          expr("substring(full, char_start + 1, char_end - char_start)")
            =!= col("turn"))
      bad.count() == 0L
    }
}
