package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.operators.Graph

/** Incremental web-graph degree maintenance — the streaming twin of
  * [[graft.operators.Graph.degrees]]. A 100 TB crawl doesn't recompute
  * the link graph from scratch per batch: each micro-batch of newly
  * discovered edges contributes a PARTIAL degree table, and readers
  * sum partials per node. Degree sums are the loop inputs of
  * PageRank/HITS seeding, frontier prioritization and spam heuristics,
  * so keeping them fresh incrementally is the scale path.
  *
  * Idempotency under at-least-once replay (including replays of
  * batches a compaction already folded in) comes from [[SumStore]]'s
  * owned-directory + fold-watermark protocol.
  *
  * Edge contract: like the batch operator, degrees count DISTINCT
  * edges — each (src, dst) pair must reach the sink in exactly one
  * batch (the incremental-dedup operators are the upstream that
  * guarantees this for a crawl frontier); within a batch duplicates
  * are collapsed here.
  */
object StreamingGraph {

  private val Keys = Seq("node")
  private val Sums = Seq("out_deg", "in_deg")

  /** foreachBatch body: this batch's partial in/out degrees over its
    * deduplicated edges, owned-by-path. O(batch) work: two hash
    * aggregations on batch rows only — the store is never read.
    */
  def writeDegreeBatch(batch: DataFrame, storePath: String,
                       srcCol: String, dstCol: String,
                       batchId: Long): Unit =
    SumStore.writeBatch(
      Graph.degrees(batch.select(col(srcCol), col(dstCol)).distinct(),
        srcCol, dstCol),
      storePath, batchId)

  /** Wire an edge stream into a partial-degree store. */
  def degreeSink(stream: DataFrame, storePath: String, srcCol: String,
                 dstCol: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        writeDegreeBatch(batch, storePath, srcCol, dstCol, batchId)
    }

  /** Current `(node, out_deg, in_deg)` over everything landed so far:
    * one hash aggregation over folded + fresh partial rows.
    */
  def degrees(spark: SparkSession, storePath: String): DataFrame =
    SumStore.merged(spark, storePath, Keys, Sums)

  /** Fold the store (see [[SumStore.compact]]). */
  def compactDegrees(spark: SparkSession, storePath: String): Unit =
    SumStore.compact(spark, storePath, Keys, Sums)
}
