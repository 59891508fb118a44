package graft.streaming

import graft.SparkSpec
import graft.operators.Stats
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** The streaming annotation-log store: per-batch count partials,
  * on-demand Fleiss-κ and rater-agreement parity with the batch
  * operators over the full rating log, replay idempotency, and fold
  * preservation.
  */
class StreamingRatingsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  // 12 items × up to 6 raters; rater 3 votes from a wider category
  // set (the ext_rater_agreement fixture shape), so both metrics are
  // non-degenerate
  private val log: Seq[(Long, Long, Long)] = (0 until 144).map { i =>
    val item = i.toLong % 12
    val rater = i.toLong % 6
    val cat = if (rater == 3) i.toLong % 5 else item % 3
    (item, rater, cat)
  }

  private def batchKappa =
    Stats.fleissKappa(log.toDF("item", "rater", "cat"), "item", "cat")
      .as[(Long, Long, Double, Double, Option[Double])].collect().toSet

  private def batchAgree =
    Stats.raterAgreement(log.toDF("item", "rater", "cat"),
        "item", "rater", "cat")
      .as[(Long, Long, Long, Double)].collect().toSet

  private def batchAlpha =
    Stats.krippendorffAlpha(log.toDF("item", "rater", "cat"),
        "item", "cat")
      .as[(Long, Long, Option[Double])].collect().toSet

  private def batchAlphaOrd =
    Stats.krippendorffAlphaOrdinal(log.toDF("item", "rater", "cat"),
        "item", "cat")
      .as[(Long, Long, Option[Double])].collect().toSet

  private def batchDifficulty =
    Stats.annotationEntropy(log.toDF("item", "rater", "cat"),
        "item", "cat")
      .as[(Long, Long, Long, Double, Double)].collect().toSet

  test("streamed kappa and rater agreement == the batch operators " +
      "over the full rating log; compaction preserves both") {
    implicit val sqlCtx = spark.sqlContext
    val store = tmp("rat_store"); val cp = tmp("rat_ckpt")
    val src = MemoryStream[(Long, Long, Long)]
    val q = StreamingRatings.ratingsSink(
        src.toDF().toDF("item", "rater", "cat"),
        "item", "rater", "cat", store)
      .option("checkpointLocation", cp).start()
    try {
      log.grouped(48).foreach { b =>
        src.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    assert(StreamingRatings.fleissKappa(spark, store)
      .as[(Long, Long, Double, Double, Option[Double])].collect()
      .toSet === batchKappa)
    assert(StreamingRatings.raterAgreement(spark, store)
      .as[(Long, Long, Long, Double)].collect().toSet === batchAgree)
    assert(StreamingRatings.krippendorffAlpha(spark, store)
      .as[(Long, Long, Option[Double])].collect().toSet === batchAlpha)
    assert(StreamingRatings.krippendorffAlphaOrdinal(spark, store)
      .as[(Long, Long, Option[Double])].collect().toSet ===
      batchAlphaOrd)
    assert(StreamingRatings.itemDifficulty(spark, store)
      .as[(Long, Long, Long, Double, Double)].collect().toSet ===
      batchDifficulty)
    StreamingRatings.compactCounts(spark, store)
    assert(StreamingRatings.fleissKappa(spark, store)
      .as[(Long, Long, Double, Double, Option[Double])].collect()
      .toSet === batchKappa)
    assert(StreamingRatings.raterAgreement(spark, store)
      .as[(Long, Long, Long, Double)].collect().toSet === batchAgree)
  }

  test("a replayed batch rewrites its partial idempotently — ratings " +
      "are never double-counted") {
    val store = tmp("rat_replay")
    StreamingRatings.recordBatch(
      log.take(72).toDF("item", "rater", "cat"),
      "item", "rater", "cat", store, batchId = 0L)
    StreamingRatings.recordBatch(
      log.drop(72).toDF("item", "rater", "cat"),
      "item", "rater", "cat", store, batchId = 1L)
    val before = StreamingRatings.counts(spark, store)
      .as[(Long, Long, Long, Long)].collect().toSet
    StreamingRatings.recordBatch(
      log.drop(72).toDF("item", "rater", "cat"),
      "item", "rater", "cat", store, batchId = 1L)
    assert(StreamingRatings.counts(spark, store)
      .as[(Long, Long, Long, Long)].collect().toSet === before)
    assert(StreamingRatings.raterAgreement(spark, store)
      .as[(Long, Long, Long, Double)].collect().toSet === batchAgree)
  }
}
