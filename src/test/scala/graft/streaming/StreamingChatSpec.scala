package graft.streaming

import graft.SparkSpec
import graft.operators.Chat
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

case class Turn(conv: Long, idx: Int, role: String, text: String,
                ts: java.sql.Timestamp)

/** Streaming conversation assembly on MemoryStream: turns split across
  * micro-batches (and arriving out of idx order) merge in session
  * state, each conversation emits exactly once when the inactivity gap
  * closes it, and the rendered text is bit-identical to the batch
  * Chat.renderConversations over the same rows.
  */
class StreamingChatSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  private val base = 1700000000000L
  private def ts(offsetSec: Long) =
    new java.sql.Timestamp(base + offsetSec * 1000)

  test("turns merge across batches; closed conv matches batch render") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Turn]
    val out = StreamingChat.conversations(src.toDF(), "conv", "idx",
      "role", "text", "ts", gap = "60 seconds", lateness = "0 seconds")
    val q = out.writeStream
      .format("memory").queryName("chat_test")
      .outputMode("append")
      .option("checkpointLocation", tmp("chat_ckpt"))
      .start()
    try {
      // batch 1: first two turns of conv 1 — idx 1 arrives BEFORE idx 0
      src.addData(
        Turn(1L, 1, "assistant", "hello", ts(10)),
        Turn(1L, 0, "user", "hi", ts(0)))
      q.processAllAvailable()
      // batch 2: 30 s later, still inside the gap — same conversation
      src.addData(Turn(1L, 2, "user", "bye", ts(40)))
      q.processAllAvailable()
      // batch 3: 10 min later on another conv — watermark closes conv 1
      src.addData(Turn(2L, 0, "user", "solo", ts(700)))
      q.processAllAvailable()
      val closed = spark.table("chat_test")
        .select($"conv", $"n_turns", $"text")
        .as[(Long, Int, String)].collect().toSeq
      assert(closed === Seq((1L, 3,
        "<|user|>hi<|end|><|assistant|>hello<|end|><|user|>bye<|end|>")))

      // batch parity: the batch renderer over the same turn rows
      // produces the identical text
      val batchText = Chat.renderConversations(
          Seq((1L, 0, "user", "hi"), (1L, 1, "assistant", "hello"),
            (1L, 2, "user", "bye")).toDF("conv", "idx", "role", "text"),
          "conv", "idx", "role", "text")
        .select("text").as[String].head()
      assert(closed.head._3 === batchText)
    } finally q.stop()
  }

  test("restart from checkpoint never re-emits a closed conversation") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Turn]
    val ckpt = tmp("chat_restart_ckpt")
    val out = tmp("chat_restart_out")
    // memory sink can't recover from a checkpoint; the file sink is
    // the fault-tolerant one, so the restart contract is tested there
    def start() =
      StreamingChat.conversations(src.toDF(), "conv", "idx", "role",
          "text", "ts", gap = "60 seconds", lateness = "0 seconds")
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    val q1 = start()
    try {
      src.addData(Turn(1L, 0, "user", "a", ts(0)))
      q1.processAllAvailable()
      src.addData(Turn(2L, 0, "user", "b", ts(700))) // closes conv 1
      q1.processAllAvailable()
      assert(spark.read.parquet(out).count() === 1)
    } finally q1.stop()
    // restart against the same checkpoint: committed batches must not
    // replay (conv 1 stays emitted-once), state must survive (conv 2
    // closes from its checkpointed session)
    val q2 = start()
    try {
      src.addData(Turn(3L, 0, "user", "c", ts(1500))) // closes conv 2
      q2.processAllAvailable()
      val after = spark.read.parquet(out)
        .select($"conv").as[Long].collect().toSeq.sorted
      assert(after === Seq(1L, 2L)) // each exactly once across restart
    } finally q2.stop()
  }

  test("each conversation emits exactly once (append mode)") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Turn]
    val out = StreamingChat.conversations(src.toDF(), "conv", "idx",
      "role", "text", "ts", gap = "60 seconds", lateness = "0 seconds")
    val q = out.writeStream
      .format("memory").queryName("chat_once")
      .outputMode("append")
      .option("checkpointLocation", tmp("chat_ckpt2"))
      .start()
    try {
      src.addData(
        Turn(1L, 0, "user", "a", ts(0)),
        Turn(2L, 0, "user", "b", ts(5)))
      q.processAllAvailable()
      src.addData(Turn(3L, 0, "user", "late", ts(1000)))
      q.processAllAvailable()
      src.addData(Turn(4L, 0, "user", "later", ts(2000)))
      q.processAllAvailable()
      val rows = spark.table("chat_once")
        .select($"conv").as[Long].collect().toSeq.sorted
      // convs 1..3 closed (each exactly once); 4 still open
      assert(rows === Seq(1L, 2L, 3L))
    } finally q.stop()
  }
}
