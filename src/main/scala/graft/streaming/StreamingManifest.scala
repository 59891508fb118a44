package graft.streaming

import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.operators.Corpus

/** Incremental corpus manifest — the streaming twin of
  * [[graft.operators.Corpus.manifest]]: as document micro-batches
  * land, each contributes its shard-level partial (doc count, token
  * total, Σ-hash32 content fingerprint), and readers sum partials per
  * shard. Because the manifest rows are MERGEABLE by construction,
  * the live store always equals the batch manifest of everything
  * ingested — the continuously-maintained dataset-release artifact
  * (a training run can pin the corpus state it saw without a full
  * rescan).
  *
  * Idempotency under at-least-once replay (including replays of
  * batches a compaction already folded) comes from [[SumStore]]'s
  * owned-directory + fold-watermark protocol. Contract: each document
  * reaches the sink in exactly one batch (upstream exact/incremental
  * dedup), with a fixed shard grid across the store's lifetime.
  */
object StreamingManifest {

  private val Keys = Seq("shard")
  private val Sums = Seq("n_docs", "n_tokens", "content_fp")

  /** foreachBatch body: this batch's shard partials, owned-by-path.
    * O(batch) work — one narrow hash projection + one hash agg on
    * batch rows only.
    */
  def writeManifestBatch(batch: DataFrame, storePath: String,
                         idCol: String, textCol: String, nShards: Int,
                         batchId: Long): Unit =
    SumStore.writeBatch(Corpus.manifest(batch, idCol, textCol, nShards),
      storePath, batchId)

  /** Wire a document stream into a manifest store. */
  def manifestSink(stream: DataFrame, storePath: String, idCol: String,
                   textCol: String, nShards: Int): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        writeManifestBatch(batch, storePath, idCol, textCol, nShards,
          batchId)
    }

  /** Current `(shard, n_docs, n_tokens, content_fp)` over everything
    * ingested so far.
    */
  def manifest(spark: SparkSession, storePath: String): DataFrame =
    SumStore.merged(spark, storePath, Keys, Sums)

  /** Fold the store (see [[SumStore.compact]]). */
  def compactManifest(spark: SparkSession, storePath: String): Unit =
    SumStore.compact(spark, storePath, Keys, Sums)
}
