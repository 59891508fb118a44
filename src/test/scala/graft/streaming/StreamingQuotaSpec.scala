package graft.streaming

import graft.SparkSpec
import graft.operators.Corpus
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

case class QDoc(source: String, doc_id: Long, text: String)

/** Cross-batch token-budget admission: per-batch greedy fill matches
  * the batch operator's conventions (md5 priority, crossing doc kept)
  * offset by previously-admitted tokens, the gate CLOSES once a
  * group's budget is spent, redelivery is emit-identical, and
  * compaction preserves the spend totals.
  */
class StreamingQuotaSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  // every doc is 4 tokens; budget 10 → per group: 2 full docs admit
  // (8 tokens), the 3rd CROSSES (12 > 10) and is kept, the 4th+ drop
  private def doc(src: String, id: Long) =
    QDoc(src, id, s"t$id a b c")

  test("admission gate: crossing doc kept, gate closed afterwards, " +
      "single-batch run matches tokenQuotaByGroup") {
    val store = tmp("quota_store")
    val b1 = Seq(doc("s1", 1), doc("s1", 2), doc("s2", 3))
    val b2 = Seq(doc("s1", 4), doc("s1", 5), doc("s2", 6))
    val b3 = Seq(doc("s1", 7), doc("s2", 8))
    val a1 = StreamingQuota.admitAndRecord(b1.toDF(), "source",
      "doc_id", "text", tokenBudget = 10, store, 0L)
    val a2 = StreamingQuota.admitAndRecord(b2.toDF(), "source",
      "doc_id", "text", tokenBudget = 10, store, 1L)
    val a3 = StreamingQuota.admitAndRecord(b3.toDF(), "source",
      "doc_id", "text", tokenBudget = 10, store, 2L)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").as[Long].collect().toSet
    // batch 1: s1 admits both (8 ≤ 10 with crossing rule), s2 admits 1
    assert(ids(a1) === Set(1L, 2L, 3L))
    // batch 2: s1 spent 8 → first doc crosses (12 > 10) and is KEPT,
    // second drops; s2 spent 4 → doc 6 admits (8 < 10... crossing)
    val a2ids = ids(a2)
    assert(a2ids.contains(6L))
    assert((a2ids intersect Set(4L, 5L)).size === 1,
      s"exactly one s1 doc may cross: $a2ids")
    // batch 3: s1 spent 12 ≥ 10 → closed; s2 spent 8 → doc 8 crosses
    assert(ids(a3) === Set(8L))
    // spend totals match what was admitted
    val spent = StreamingQuota.spentTokens(spark, store, "source")
      .as[(String, Long)].collect().toMap
    assert(spent === Map("s1" -> 12L, "s2" -> 12L))
    // single-batch parity: same docs through the batch operator admit
    // a superset ordered by the same priority (batch boundaries only
    // decide WHICH docs fill first, never the budget arithmetic)
    val oneShot = Corpus.tokenQuotaByGroup(
      (b1 ++ b2 ++ b3).toDF(), "source", "doc_id", "text", 10L)
    assert(oneShot.select("source").distinct().count() === 2)
    val oneShotSpent = oneShot.groupBy($"source")
      .agg(org.apache.spark.sql.functions.sum($"n_tokens").as("t"))
      .as[(String, Long)].collect().toMap
    assert(oneShotSpent === Map("s1" -> 12L, "s2" -> 12L))
  }

  test("redelivery recomputes the identical admit set; compaction " +
      "preserves spend and the closed gate stays closed") {
    val store = tmp("quota_store2")
    val b1 = Seq(doc("s1", 1), doc("s1", 2), doc("s1", 3))
    val b2 = Seq(doc("s1", 4))
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").as[Long].collect().toSet
    val first = ids(StreamingQuota.admitAndRecord(b1.toDF(), "source",
      "doc_id", "text", 10, store, 0L))
    assert(first === Set(1L, 2L, 3L)) // 12 tokens via the crossing rule
    // at-least-once redelivery of batch 0: same inputs, same answer,
    // store unchanged
    val replay = ids(StreamingQuota.admitAndRecord(b1.toDF(), "source",
      "doc_id", "text", 10, store, 0L))
    assert(replay === first)
    assert(StreamingQuota.spentTokens(spark, store, "source")
      .as[(String, Long)].collect().toMap === Map("s1" -> 12L))
    StreamingQuota.compactSpent(spark, store, "source")
    assert(StreamingQuota.spentTokens(spark, store, "source")
      .as[(String, Long)].collect().toMap === Map("s1" -> 12L))
    // gate still closed after the fold
    assert(ids(StreamingQuota.admitAndRecord(b2.toDF(), "source",
      "doc_id", "text", 10, store, 1L)).isEmpty)
  }

  test("quotaSink wires a MemoryStream through the gate") {
    implicit val sqlCtx = spark.sqlContext
    val store = tmp("quota_store3")
    val out = tmp("quota_out")
    val src = MemoryStream[QDoc]
    val q = StreamingQuota.quotaSink(src.toDF(), "source", "doc_id",
        "text", tokenBudget = 10, store) { admitted =>
      admitted.write.mode("append").parquet(out)
    }.option("checkpointLocation", tmp("quota_ckpt")).start()
    try {
      src.addData(doc("s1", 1), doc("s1", 2)); q.processAllAvailable()
      src.addData(doc("s1", 3), doc("s1", 4)); q.processAllAvailable()
      src.addData(doc("s1", 5)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out).select("doc_id")
      .as[Long].collect().toSet
    // 8 tokens after batch 1; one of batch 2 crosses; batch 3 closed
    assert(got.size === 3 && Set(1L, 2L).subsetOf(got))
    assert(!got.contains(5L))
  }
}
