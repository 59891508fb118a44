package graft.streaming

import graft.SparkSpec
import graft.operators.Web
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

case class Discovered(url: String)

/** End-to-end STREAMING crawl frontier: discovered URLs flow through
  * the seen-key gate (cross-batch dedup), the RFC 9309 robots gate
  * (with crawl delays) and politeness scheduling inside one
  * foreachBatch — the composition a continuous crawler actually runs.
  * Asserts cross-batch dedup, robots filtering, delay-driven offsets
  * and per-batch deterministic slots.
  */
class StreamingFrontierSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("seen-gate -> robots gate -> schedule composition") {
    implicit val sqlCtx = spark.sqlContext
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n"),
      // the empty graftbot group must TRAIL: a blank line between two
      // User-agent lines does not split a header run (RFC 9309 §2.2),
      // so leading placement would stack it with '*' and inherit /
      ("b.com", "User-agent: *\nDisallow: /\nUser-agent: graftbot\n"))
      .toDF("host", "robots")
    val rules = Web.parseRobots(robots, "host", "robots")
      .localCheckpoint()
    val seenStore = tmp("frontier_seen")
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Int, Double)]
    def process(batch: DataFrame, id: Long): Unit = {
      val fresh = StreamingSeen.unseenAndRecord(batch, "url",
        seenStore, id)
      val gated = Web.robotsAllowed(fresh, "url", rules, "graftbot")
        .filter(col("allowed"))
        .select(col("url"), col("crawl_delay"))
      val sched = Web.frontierSchedule(gated, "url", "crawl_delay",
        defaultDelaySec = 1.0)
      out ++= sched.select(col("url"), col("fetch_slot"),
          col("fetch_offset_s"))
        .as[(String, Int, Double)].collect()
        .map(r => (id, r._1, r._2, r._3))
    }
    val src = MemoryStream[Discovered]
    val q = src.toDF().writeStream
      .foreachBatch((b: DataFrame, id: Long) => process(b, id))
      .option("checkpointLocation", tmp("frontier_ckpt")).start()
    try {
      src.addData(Discovered("https://a.com/p1"),
        Discovered("https://a.com/p2"),
        Discovered("https://a.com/private/x"), // robots-disallowed
        Discovered("https://b.com/anything"))  // empty specific group
      q.processAllAvailable()
      src.addData(Discovered("https://a.com/p1"), // already seen
        Discovered("https://a.com/p3"))
      q.processAllAvailable()
    } finally q.stop()
    val b0 = out.filter(_._1 == 0L)
    // private/x never scheduled; b.com allowed via its EMPTY specific
    // group (the r7 falsifier shape, live in the pipeline)
    assert(!out.exists(_._2.contains("/private/")))
    assert(b0.exists(_._2 == "https://b.com/anything"))
    // a.com batch-0 slots 0,1 with the 2 s declared delay
    val a0 = b0.filter(_._2.startsWith("https://a.com"))
      .map(r => (r._3, r._4)).sortBy(_._1)
    assert(a0 === Seq((0, 0.0), (1, 2.0)))
    // b.com has no delay in its selected (empty) group -> default 1 s,
    // single URL at slot 0
    assert(b0.find(_._2.startsWith("https://b.com"))
      .map(r => (r._3, r._4)) === Some((0, 0.0)))
    // batch 1: the repeat is gated out, only p3 schedules (slot 0 of
    // ITS batch — politeness windows restart per scheduling round)
    val b1 = out.filter(_._1 == 1L)
    assert(b1.map(_._2).toSet === Set("https://a.com/p3"))
    assert(b1.head._3 === 0 && b1.head._4 === 0.0)
  }
}
