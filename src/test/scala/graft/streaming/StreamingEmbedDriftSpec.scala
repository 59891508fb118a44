package graft.streaming

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** Streamed embedding-centroid drift: per-batch centroid partials
  * sum-merge to the EXACT full-log centroid (fx sums are mergeable),
  * the read equals the batch embeddingDrift bit for bit, replays
  * cannot double-count, compaction is view-equal.
  */
class StreamingEmbedDriftSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  private def vec(seed: Int): Array[Float] =
    Array.tabulate(8)(j => ((seed * 7 + j * 13) % 100) / 100f)

  private def refRows: Seq[(String, Array[Float])] =
    (0 until 60).map(i => (s"g${i % 3}", vec(i)))

  private def batchRows(b: Int): Seq[(String, Array[Float])] =
    (0 until 40).map(i => (s"g${i % 3}", vec(i * 3 + b * 101)))

  test("streamed drift equals the batch embeddingDrift over the " +
      "replayed log, bit for bit") {
    implicit val sqlCtx = spark.sqlContext
    val store = tmp("ed_store")
    val src = MemoryStream[(String, Array[Float])]
    val q = StreamingEmbedDrift.driftSink(
        src.toDF().toDF("grp", "vec"), store, "grp", "vec")
      .option("checkpointLocation", tmp("ed_ckpt")).start()
    try {
      (0 until 3).foreach { b =>
        src.addData(batchRows(b): _*)
        q.processAllAvailable()
      }
      val ref = refRows.toDF("grp", "vec")
      val refCounts = Similarity.centroidCounts(ref, "grp", "vec")
      val streamed = StreamingEmbedDrift.driftAgainstReference(
          spark, store, refCounts)
        .as[(String, Long, Long, Option[Double])].collect()
        .sortBy(_._1).toSeq
      val replayed = (0 until 3).flatMap(batchRows).toDF("grp", "vec")
      val batch = Similarity.embeddingDrift(ref, replayed, "grp", "vec")
        .as[(String, Long, Long, Option[Double])].collect()
        .sortBy(_._1).toSeq
      assert(streamed === batch)
      // 60 ref rows split 20/20/20; 3×40 current rows split 42/39/39
      assert(streamed.forall(r => r._4.isDefined && r._2 == 20))
      assert(streamed.map(_._3).sum === 120L)
    } finally q.stop()
  }

  test("replayed batch overwrite cannot double-count; compaction " +
      "view-equal and bounds the store to groups x dims") {
    val store = tmp("ed_store2")
    val b0 = batchRows(0).toDF("grp", "vec")
    val b1 = batchRows(1).toDF("grp", "vec")
    StreamingEmbedDrift.writeBatch(b0, store, "grp", "vec", 0L)
    StreamingEmbedDrift.writeBatch(b1, store, "grp", "vec", 1L)
    val before = StreamingEmbedDrift.centroidCounts(spark, store)
      .as[(String, Int, Long, Long)].collect().sortBy(r => (r._1, r._2))
      .toSeq
    StreamingEmbedDrift.writeBatch(b1, store, "grp", "vec", 1L)
    val after = StreamingEmbedDrift.centroidCounts(spark, store)
      .as[(String, Int, Long, Long)].collect().sortBy(r => (r._1, r._2))
      .toSeq
    assert(after === before)
    // counts are the true fx sums over both batches
    val want = Similarity.centroidCounts(
        (batchRows(0) ++ batchRows(1)).toDF("grp", "vec"), "grp", "vec")
      .as[(String, Int, Long, Long)].collect().sortBy(r => (r._1, r._2))
      .toSeq
    assert(after === want)
    StreamingEmbedDrift.compactCounts(spark, store)
    val compacted = StreamingEmbedDrift.centroidCounts(spark, store)
      .as[(String, Int, Long, Long)].collect().sortBy(r => (r._1, r._2))
      .toSeq
    assert(compacted === before)
    // 3 groups x (8 dims + the pos = -1 raw-count sentinel)
    assert(spark.read.parquet(store).count() <= 3 * 9)
  }
}
