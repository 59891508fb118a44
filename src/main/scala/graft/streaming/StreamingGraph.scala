package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}

import graft.operators.Graph

/** Incremental web-graph degree maintenance — the streaming twin of
  * [[graft.operators.Graph.degrees]]. A 100 TB crawl doesn't recompute
  * the link graph from scratch per batch: each micro-batch of newly
  * discovered edges contributes a PARTIAL degree table, and readers
  * sum partials per node. Degree sums are the loop inputs of
  * PageRank/HITS seeding, frontier prioritization and spam heuristics,
  * so keeping them fresh incrementally is the scale path.
  *
  * Idempotency (degree counts SUM across batches, so the HLL
  * blind-re-append trick doesn't apply — a replayed batch would
  * double-count): ownership + a fold watermark.
  *
  *  - each micro-batch OVERWRITES its own `batch=<id>` directory
  *    ([[StreamingSketch]]'s CMS contract): at-least-once redelivery
  *    rewrites identical bytes;
  *  - [[compactDegrees]] folds everything visible into ONE summed
  *    partition in the RESERVED directory `batch=-1` (streaming batch
  *    ids are ≥ 0, so no replay can ever overwrite the fold), carrying
  *    the max folded batch id as the `__fold_wm` data column (the fold
  *    WATERMARK; partials carry −1 there);
  *  - readers take folded rows plus partials with `batch >` the
  *    watermark — so a batch replayed even AFTER a compaction folded
  *    it in re-creates its directory but is ignored, not double-
  *    counted. Compaction re-run with no new batches rewrites the
  *    identical fold (idempotent).
  *
  * Edge contract: like the batch operator, degrees count DISTINCT
  * edges — each (src, dst) pair must reach the sink in exactly one
  * batch (the incremental-dedup operators are the upstream that
  * guarantees this for a crawl frontier); within a batch duplicates
  * are collapsed here.
  */
object StreamingGraph {

  /** Fold watermark data column: −1 on partial rows; on folded rows
    * the greatest batch id the fold absorbed.
    */
  private val WmCol = "__fold_wm"

  /** Reserved fold directory id — streaming batch ids are ≥ 0. */
  private val FoldId = -1L

  private def batchDir(storePath: String, batchId: Long) =
    s"$storePath/batch=$batchId"

  /** foreachBatch body: this batch's partial in/out degrees over its
    * deduplicated edges, owned-by-path. O(batch) work: two hash
    * aggregations on batch rows only — the store is never read.
    */
  def writeDegreeBatch(batch: DataFrame, storePath: String,
                       srcCol: String, dstCol: String,
                       batchId: Long): Unit = {
    require(batchId >= 0, s"batch ids are >= 0, got $batchId")
    Graph.degrees(batch.select(col(srcCol), col(dstCol)).distinct(),
        srcCol, dstCol)
      .withColumn(WmCol, lit(FoldId))
      .write.mode(SaveMode.Overwrite)
      .parquet(batchDir(storePath, batchId))
  }

  /** Wire an edge stream into a partial-degree store. */
  def degreeSink(stream: DataFrame, storePath: String, srcCol: String,
                 dstCol: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        writeDegreeBatch(batch, storePath, srcCol, dstCol, batchId)
    }

  /** Rows a reader may count: the folded partition (if any) plus
    * partials newer than the fold watermark — a re-created directory
    * of an already-folded batch falls below the watermark and is
    * ignored.
    */
  private def effective(store: DataFrame): DataFrame = {
    // 1-row driver scalar, never a broadcast subtree per reader job
    val w = store.agg(max(col(WmCol))).head()
    val wm = if (w.isNullAt(0)) FoldId else w.getLong(0)
    store.filter(col(WmCol) >= 0 || col("batch").cast("long") > wm)
  }

  /** Current `(node, out_deg, in_deg)` over everything landed so far:
    * one hash aggregation over folded + fresh partial rows.
    */
  def degrees(spark: SparkSession, storePath: String): DataFrame =
    effective(spark.read.parquet(storePath))
      .groupBy(col("node"))
      .agg(sum(col("out_deg")).as("out_deg"),
        sum(col("in_deg")).as("in_deg"))

  /** Fold the store to one summed partition in the reserved `batch=-1`
    * directory, watermarked at the greatest batch id absorbed, via the
    * staged-swap protocol. Run from a maintenance schedule; bounds
    * read amplification to |nodes| + O(batches since last fold).
    */
  def compactDegrees(spark: SparkSession, storePath: String): Unit =
    Sinks.swapRewrite(spark, storePath, "batch") { store =>
      val eff = effective(store)
      // new watermark: greatest id any effective row witnessed —
      // a folded row witnessed up to its __fold_wm, a partial its own
      // directory id
      val w = eff.agg(max(greatest(col(WmCol),
        col("batch").cast("long")))).head()
      val wm = if (w.isNullAt(0)) FoldId else w.getLong(0)
      eff.groupBy(col("node"))
        .agg(sum(col("out_deg")).as("out_deg"),
          sum(col("in_deg")).as("in_deg"))
        .withColumn(WmCol, lit(wm))
        .withColumn("batch", lit(FoldId))
    }
}
