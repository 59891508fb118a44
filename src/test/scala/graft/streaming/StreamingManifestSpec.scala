package graft.streaming

import graft.SparkSpec
import graft.operators.Corpus
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

case class ManiDoc(id: Long, text: String)

/** Incremental manifest on MemoryStream: streamed shard partials
  * always equal the batch manifest over everything ingested, and
  * replay is emit-once before and after a compaction fold.
  */
class StreamingManifestSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  private val b1 = Seq(ManiDoc(1L, "alpha beta"), ManiDoc(2L, "gamma delta e"))
  private val b2 = Seq(ManiDoc(3L, "zeta"), ManiDoc(4L, "eta theta"))

  private def merged(store: String): Map[Long, (Long, Long, Long)] =
    StreamingManifest.manifest(spark, store)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  private def batchParity(docs: Seq[ManiDoc]): Map[Long, (Long, Long, Long)] =
    Corpus.manifest(docs.toDF("id", "text"), "id", "text", nShards = 4)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("streamed manifest equals the batch manifest; replay and " +
      "post-fold replay are emit-once") {
    implicit val sqlCtx = spark.sqlContext
    val store = tmp("mani_store")
    val src = MemoryStream[ManiDoc]
    val q = StreamingManifest.manifestSink(src.toDF(), store, "id",
        "text", nShards = 4)
      .option("checkpointLocation", tmp("mani_ckpt")).start()
    try {
      src.addData(b1: _*); q.processAllAvailable()
      src.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val expect = batchParity(b1 ++ b2)
    assert(merged(store) === expect)
    // at-least-once redelivery rewrites identical bytes
    StreamingManifest.writeManifestBatch(b2.toDF("id", "text"), store,
      "id", "text", 4, 1L)
    assert(merged(store) === expect)
    // fold, then replay the folded batch: below the watermark, ignored
    StreamingManifest.compactManifest(spark, store)
    assert(merged(store) === expect)
    StreamingManifest.writeManifestBatch(b2.toDF("id", "text"), store,
      "id", "text", 4, 1L)
    assert(merged(store) === expect)
    // new batches after the fold still count
    val b3 = Seq(ManiDoc(5L, "iota kappa"))
    StreamingManifest.writeManifestBatch(b3.toDF("id", "text"), store,
      "id", "text", 4, 2L)
    assert(merged(store) === batchParity(b1 ++ b2 ++ b3))
  }
}
