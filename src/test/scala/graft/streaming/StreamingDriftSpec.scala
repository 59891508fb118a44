package graft.streaming

import graft.SparkSpec
import graft.operators.Stats
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** Streamed PSI drift monitor: per-batch binCounts partials sum-merge
  * across micro-batches, the read equals the batch psi over the
  * replayed log BIT FOR BIT (shared binning + shared psiFromCounts),
  * replays cannot double-count, and compaction is view-equal.
  */
class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  // deterministic score fixtures: reference ~uniform, current shifted
  // right so several low bins thin out and the smoothing is exercised
  private def refScores: Seq[Double] =
    (0 until 400).map(i => (i % 100) / 100.0)

  private def batchScores(b: Int): Seq[Double] =
    (0 until 150).map(i => ((i * 7 + b * 31) % 60 + 35) / 100.0)

  test("streamed PSI equals the batch psi over the replayed log, " +
      "term_fx for term_fx") {
    implicit val sqlCtx = spark.sqlContext
    val store = tmp("drift_store")
    val src = MemoryStream[Double]
    val q = StreamingDrift.driftSink(src.toDF().toDF("score"), store,
        "score", bins = 10, lo = 0.0, hi = 1.0)
      .option("checkpointLocation", tmp("drift_ckpt"))
      .start()
    try {
      (0 until 3).foreach { b =>
        src.addData(batchScores(b): _*)
        q.processAllAvailable()
      }
      val ref = refScores.toDF("score")
      val refCounts = Stats.binCounts(ref, "score", 10, 0.0, 1.0)
      val streamed = StreamingDrift.psiAgainstReference(
          spark, store, refCounts, bins = 10)
        .orderBy($"bin")
        .as[(Long, Long, Long, Double, Double, Long)].collect()
      val replayed = (0 until 3).flatMap(batchScores).toDF("score")
      val batch = Stats.psi(ref, replayed, "score", bins = 10)
        .orderBy($"bin")
        .as[(Long, Long, Long, Double, Double, Long)].collect()
      assert(streamed === batch)
      // the shift is visible: scalar PSI over the fixture is
      // investigate-level (> 0.25)
      assert(streamed.map(_._6).sum / 1e9 > 0.25)
    } finally q.stop()
  }

  test("streamed KS equals the batch ksTest over the replayed log; " +
      "replay and compaction cannot move it") {
    implicit val sqlCtx = spark.sqlContext
    val store = tmp("ks_store")
    // fixed-point scores (the engine convention): permille ints
    def fx(b: Int): Seq[Long] =
      (0 until 150).map(i => ((i * 7 + b * 31) % 60 + 35).toLong)
    val src = MemoryStream[Long]
    val q = StreamingDrift.ksSink(src.toDF().toDF("score_fx"), store,
        "score_fx")
      .option("checkpointLocation", tmp("ks_ckpt"))
      .start()
    try {
      (0 until 3).foreach { b =>
        src.addData(fx(b): _*)
        q.processAllAvailable()
      }
      val ref = (0 until 400).map(i => (i % 100).toLong)
        .toDF("score_fx")
      val refCounts = Stats.scoreCounts(ref, "score_fx")
      val streamed = StreamingDrift.ksAgainstReference(spark, store,
          refCounts)
        .as[(Long, Long, Option[Double], Option[Long])].head()
      val batch = Stats.ksTest(ref,
          (0 until 3).flatMap(fx).toDF("score_fx"), "score_fx")
        .as[(Long, Long, Option[Double], Option[Long])].head()
      assert(streamed === batch)
      assert(streamed._3.get > 0.2) // the shift is visible
      // replay: re-land batch 1's partial, nothing moves
      StreamingDrift.writeScoreCounts(fx(1).toDF("score_fx"), store,
        "score_fx", 1L)
      assert(StreamingDrift.ksAgainstReference(spark, store, refCounts)
        .as[(Long, Long, Option[Double], Option[Long])].head()
        === streamed)
      StreamingDrift.compactScoreCounts(spark, store)
      assert(StreamingDrift.ksAgainstReference(spark, store, refCounts)
        .as[(Long, Long, Option[Double], Option[Long])].head()
        === streamed)
    } finally q.stop()
  }

  test("replayed batch overwrite cannot double-count; compaction " +
      "view-equal and bounds the store") {
    val store = tmp("drift_store2")
    val b0 = batchScores(0).toDF("score")
    val b1 = batchScores(1).toDF("score")
    StreamingDrift.writeBatch(b0, store, "score", 10, 0.0, 1.0, 0L)
    StreamingDrift.writeBatch(b1, store, "score", 10, 0.0, 1.0, 1L)
    val before = StreamingDrift.binnedCounts(spark, store)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    // at-least-once: batch 1 lands again (crash before checkpoint)
    StreamingDrift.writeBatch(b1, store, "score", 10, 0.0, 1.0, 1L)
    val after = StreamingDrift.binnedCounts(spark, store)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(after === before)
    // counts are the true histogram of both batches
    val want = Stats.binCounts(
        (batchScores(0) ++ batchScores(1)).toDF("score"),
        "score", 10, 0.0, 1.0)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(after === want)
    // fold to <= bins rows; view unchanged; a pre-fold replay below
    // the watermark is ignored, never double-counted
    StreamingDrift.compactCounts(spark, store)
    val compacted = StreamingDrift.binnedCounts(spark, store)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(compacted === before)
    assert(spark.read.parquet(store).count() <= 10)
    StreamingDrift.writeBatch(b1, store, "score", 10, 0.0, 1.0, 1L)
    val postReplay = StreamingDrift.binnedCounts(spark, store)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(postReplay === before)
  }
}
