package graft.streaming

import graft.SparkSpec
import graft.operators.TextAnalysis
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

case class CurDoc(doc_id: Long, text: String, ts: java.sql.Timestamp)

/** Ingest-time curation on MemoryStream: the quality gate drops
  * low-scoring docs, the content-hash dedup suppresses duplicates
  * across micro-batches, and survivors score exactly what the batch
  * qualityScore assigns (the backfill-reconciliation contract).
  */
class StreamingCurateSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  private val base = 1700000000000L
  private def ts(offsetSec: Long) =
    new java.sql.Timestamp(base + offsetSec * 1000)

  // scores ~0.5+: diverse tokens with stopwords; scores low: one token
  private val good1 = "the quick brown fox jumps over the lazy dog and that is fine"
  private val good2 = "a completely different sentence that is long and varied in every way"
  private val bad = "spam spam spam spam spam spam spam spam"

  test("curate: gates quality, dedups across batches, annotates") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[CurDoc]
    val out = StreamingCurate.curate(src.toDF(), "text", "ts",
      minQuality = 0.4, lateness = "1 hour")
    val q = out.writeStream
      .format("memory").queryName("curate_test")
      .outputMode("append")
      .option("checkpointLocation", tmp("curate_ckpt"))
      .start()
    try {
      src.addData(CurDoc(1L, good1, ts(0)), CurDoc(2L, bad, ts(1)))
      q.processAllAvailable()
      // batch 2: re-sends good1 under a new id (cross-batch dup —
      // must be suppressed by the content-hash state) + a fresh doc
      src.addData(CurDoc(3L, good1, ts(10)), CurDoc(4L, good2, ts(11)))
      q.processAllAvailable()
      val got = spark.table("curate_test")
        .select($"doc_id", $"n_tokens").as[(Long, Long)].collect().toMap
      assert(got.keySet === Set(1L, 4L)) // bad gated, dup suppressed
      assert(got(1L) === good1.split(" ").length.toLong)
    } finally q.stop()
  }

  test("curate: surviving quality equals the batch scorer exactly") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[CurDoc]
    val q = StreamingCurate.curate(src.toDF(), "text", "ts",
      minQuality = 0.0, lateness = "1 hour")
      .writeStream.format("memory").queryName("curate_parity")
      .outputMode("append")
      .option("checkpointLocation", tmp("curate_ckpt2"))
      .start()
    try {
      src.addData(CurDoc(1L, good1, ts(0)), CurDoc(2L, good2, ts(1)))
      q.processAllAvailable()
      val streamed = spark.table("curate_parity")
        .select($"doc_id", $"quality").as[(Long, Double)].collect().toMap
      val batch = TextAnalysis.qualityScore(
          Seq((1L, good1), (2L, good2)).toDF("doc_id", "text"),
          "doc_id", "text")
        .as[(Long, Double)].collect().toMap
      assert(streamed === batch) // bit-identical, not approximate
    } finally q.stop()
  }
}
