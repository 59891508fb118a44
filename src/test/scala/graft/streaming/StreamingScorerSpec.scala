package graft.streaming

import graft.SparkSpec
import graft.operators.Stats
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** Streamed scorer-quality monitor: per-batch labeled score-count
  * partials sum-merge across micro-batches; the AUC and rank-sum
  * reads equal the batch metrics over the replayed label log BIT FOR
  * BIT (shared count table + shared FromCounts readers), replays
  * cannot double-count, compaction is view-equal.
  */
class StreamingScorerSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  // a separating scorer with deliberate overlap: positives mostly
  // high, negatives mostly low, plenty of ties
  private def preds(b: Int): Seq[(Long, Boolean)] =
    (0 until 200).map { i =>
      val s = ((i * 7 + b * 31) % 50).toLong
      (s, (i * 13 + b) % 50 < s)
    }

  test("streamed AUC and rank-sum z equal the batch metrics over the " +
      "replayed log; replay and compaction cannot move them") {
    implicit val sqlCtx = spark.sqlContext
    val store = tmp("scorer_store")
    val src = MemoryStream[(Long, Boolean)]
    val q = StreamingScorer.scorerSink(
        src.toDF().toDF("score_fx", "label"), store, "score_fx",
        "label")
      .option("checkpointLocation", tmp("scorer_ckpt"))
      .start()
    try {
      (0 until 3).foreach { b =>
        src.addData(preds(b): _*)
        q.processAllAvailable()
      }
      def aucSnap() = StreamingScorer.aucSnapshot(spark, store)
        .as[(Long, Long, Option[Double])].head()
      def zSnap() = StreamingScorer.rankSumSnapshot(spark, store)
        .as[(Long, Long, Option[Double], Option[Double])].head()
      val (sAuc, sZ) = (aucSnap(), zSnap())
      val replayed = (0 until 3).flatMap(preds)
        .toDF("score_fx", "label")
      val bAuc = Stats.auc(replayed, "score_fx", "label")
        .as[(Long, Long, Option[Double])].head()
      val bZ = Stats.rankSumTest(replayed, "score_fx", "label")
        .as[(Long, Long, Option[Double], Option[Double])].head()
      assert(sAuc === bAuc)
      assert(sZ === bZ)
      // the fixture genuinely separates: AUC well above chance and
      // the z calls it significant
      assert(sAuc._3.get > 0.7)
      assert(sZ._4.get > 1.96)
      // replay: re-land batch 1's partial, nothing moves
      StreamingScorer.writeBatch(
        preds(1).toDF("score_fx", "label"), store, "score_fx",
        "label", 1L)
      assert(aucSnap() === sAuc && zSnap() === sZ)
      // compaction: view-equal, store folds to the distinct scores
      StreamingScorer.compact(spark, store)
      assert(aucSnap() === sAuc && zSnap() === sZ)
      assert(spark.read.parquet(store).count() <= 50)
    } finally q.stop()
  }
}
