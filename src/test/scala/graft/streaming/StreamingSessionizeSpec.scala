package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

case class Ev(user: String, ts: java.sql.Timestamp, ord: Long)

/** Streaming sessionization on MemoryStream: native session_window
  * merges events across micro-batches inside the state store, emits a
  * session once the watermark closes it, and its closed sessions agree
  * 1:1 with the batch Temporal.sessionize/sessionStats shadow over the
  * same events (the backfill-reconciliation contract).
  */
class StreamingSessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  private val base = 1700000000000L // 2023-11-14 UTC
  private def ts(offsetSec: Long) =
    new java.sql.Timestamp(base + offsetSec * 1000)

  test("session_window merges across batches and closes on watermark") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Ev]
    val out = StreamingSessionize.sessions(
      src.toDF(), "user", "ts", "ord", gap = "60 seconds",
      lateness = "0 seconds")
    val q = out.writeStream
      .format("memory").queryName("sess_test")
      .outputMode("append")
      .option("checkpointLocation", tmp("sess_ckpt"))
      .start()
    try {
      // batch 1: two events 30 s apart (one session so far)
      src.addData(Ev("u", ts(0), 1L), Ev("u", ts(30), 2L))
      q.processAllAvailable()
      // batch 2: 30 s later again — still the same session (gap 60 s
      // from the PREVIOUS event, cross-batch merge in the state store)
      src.addData(Ev("u", ts(60), 3L))
      q.processAllAvailable()
      // batch 3: 10 min later — new session; watermark (= max ts) now
      // passes session-1 end + gap, so session 1 must emit
      src.addData(Ev("u", ts(660), 4L))
      q.processAllAvailable()
      val closed = spark.table("sess_test")
        .select($"user", $"n_events", $"first_ord")
        .as[(String, Long, Long)].collect()
      assert(closed === Array(("u", 3L, 1L)))
    } finally q.stop()
  }

  test("closed streaming sessions equal the batch shadow's sessions") {
    implicit val sqlCtx = spark.sqlContext
    // fed in timestamp order: lateness is 0, so an out-of-order event
    // would be (correctly) watermark-dropped and diverge from batch
    val events = Seq(
      Ev("a", ts(0), 1L), Ev("b", ts(10), 4L),    // sessions open
      Ev("a", ts(40), 2L), Ev("b", ts(50), 5L),   // same sessions
      Ev("a", ts(200), 3L),                       // a session 2 (gap 160)
      Ev("flush", ts(5000), 99L))                 // advances watermark
    val src = MemoryStream[Ev]
    val q = StreamingSessionize.sessions(
        src.toDF(), "user", "ts", "ord", gap = "60 seconds",
        lateness = "0 seconds")
      .writeStream.format("memory").queryName("sess_parity")
      .outputMode("append")
      .option("checkpointLocation", tmp("sessp_ckpt"))
      .start()
    try {
      events.grouped(2).foreach { b =>
        src.addData(b: _*); q.processAllAvailable()
      }
      val streamed = spark.table("sess_parity")
        .filter($"user" =!= "flush")
        .select($"user", $"window_start", $"window_end", $"n_events",
          $"first_ord", $"session_start_ts", $"session_end_ts")
        .collect().toSet
      val batch = StreamingSessionize.sessionsBatch(
          events.filter(_.user != "flush").toDF()
            .select($"user", expr("unix_micros(ts)").as("ts_us"), $"ord"),
          "user", "ts_us", "ord", gapUs = 60L * 1000000)
        .collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }
}
