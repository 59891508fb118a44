package graft.streaming

import graft.SparkSpec
import graft.operators.Stats
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** The streaming eval-outcome store: per-batch count partials,
  * on-demand pass@k parity with the batch estimator over the full
  * sample log, replay idempotency, and fold preservation.
  */
class StreamingEvalSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  private val log: Seq[(Long, Boolean)] = (0 until 120).map { i =>
    (i.toLong % 12, (i * 7) % 11 < 4)
  }

  test("passAtK over the streamed store == batch passAtK over the " +
      "full sample log; compaction preserves the metric") {
    implicit val sqlCtx = spark.sqlContext
    val store = tmp("ev_store"); val cp = tmp("ev_ckpt")
    val src = MemoryStream[(Long, Boolean)]
    val q = StreamingEval.evalSink(src.toDF().toDF("problem", "passed"),
        "problem", "passed", store)
      .option("checkpointLocation", cp).start()
    try {
      log.grouped(40).foreach { b =>
        src.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    val want = Stats.passAtK(log.toDF("problem", "passed"),
        "problem", "passed", k = 3)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(want.nonEmpty)
    val got = StreamingEval.passAtK(spark, store, k = 3)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got === want)
    StreamingEval.compactCounts(spark, store)
    assert(StreamingEval.passAtK(spark, store, k = 3)
      .as[(Long, Long, Long, Double)].collect().toSet === want)
  }

  test("a replayed batch rewrites its partial idempotently — samples " +
      "are never double-counted") {
    val store = tmp("ev_replay")
    StreamingEval.recordBatch(log.take(60).toDF("problem", "passed"),
      "problem", "passed", store, batchId = 0L)
    StreamingEval.recordBatch(log.drop(60).toDF("problem", "passed"),
      "problem", "passed", store, batchId = 1L)
    val before = StreamingEval.counts(spark, store)
      .as[(Long, Long, Long)].collect().toSet
    StreamingEval.recordBatch(log.drop(60).toDF("problem", "passed"),
      "problem", "passed", store, batchId = 1L)
    assert(StreamingEval.counts(spark, store)
      .as[(Long, Long, Long)].collect().toSet === before)
    assert(StreamingEval.passAtK(spark, store, k = 3)
      .as[(Long, Long, Long, Double)].collect().toSet ===
      Stats.passAtK(log.toDF("problem", "passed"), "problem", "passed",
          k = 3)
        .as[(Long, Long, Long, Double)].collect().toSet)
  }
}
