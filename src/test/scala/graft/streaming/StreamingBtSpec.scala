package graft.streaming

import graft.SparkSpec
import graft.operators.Stats
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** The streaming comparison-log store: per-batch count partials,
  * on-demand MM fit parity with the batch operator over the full log,
  * replay idempotency, and fold preservation.
  */
class StreamingBtSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  private val log: Seq[(Long, Long)] = (0 until 90).map { i =>
    (i.toLong % 8, (3L * i + 1) % 8)
  }.filter { case (w, l) => w != l }

  test("strengths over the streamed store == batch btStrengths over " +
      "the full log; compaction preserves the fit") {
    implicit val sqlCtx = spark.sqlContext
    val store = tmp("bt_store"); val cp = tmp("bt_ckpt")
    val src = MemoryStream[(Long, Long)]
    val q = StreamingBt.btSink(src.toDF().toDF("w", "l"), "w", "l", store)
      .option("checkpointLocation", cp).start()
    try {
      log.grouped(30).foreach { b =>
        src.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    val want = Stats.btStrengths(log.toDF("w", "l"), "w", "l", iters = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    val got = StreamingBt.strengths(spark, store, iters = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got === want)
    StreamingBt.compactCounts(spark, store)
    assert(StreamingBt.strengths(spark, store, iters = 2)
      .as[(Long, Long, Long, Double)].collect().toSet === want)
  }

  test("a replayed batch rewrites its partial idempotently — " +
      "comparisons are never double-counted") {
    val store = tmp("bt_replay")
    val b0 = log.take(40).toDF("w", "l")
    val b1 = log.drop(40).toDF("w", "l")
    StreamingBt.recordBatch(b0, "w", "l", store, batchId = 0L)
    StreamingBt.recordBatch(b1, "w", "l", store, batchId = 1L)
    val before = StreamingBt.counts(spark, store)
      .as[(Long, Long, Long)].collect().toSet
    // at-least-once redelivery of batch 1
    StreamingBt.recordBatch(b1, "w", "l", store, batchId = 1L)
    assert(StreamingBt.counts(spark, store)
      .as[(Long, Long, Long)].collect().toSet === before)
    assert(StreamingBt.strengths(spark, store)
      .as[(Long, Long, Long, Double)].collect().toSet ===
      Stats.btStrengths(log.toDF("w", "l"), "w", "l")
        .as[(Long, Long, Long, Double)].collect().toSet)
  }
}
