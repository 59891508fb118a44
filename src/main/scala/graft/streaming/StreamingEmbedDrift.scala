package graft.streaming

import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.operators.Similarity

/** Streamed per-group EMBEDDING drift monitor —
  * [[StreamingDrift]]'s semantic sibling: scores can hold steady
  * while a source's CONTENT moves (topic shift, language mix, spam),
  * and the cheapest streamed tell is the per-group centroid. Each
  * micro-batch lands its [[Similarity.centroidCounts]] partial —
  * per-(group, dim) fixed-point component sums + vector counts — in
  * a [[SumStore]]; because fxSum is a sum of per-row quantized terms,
  * the SUM-merged store reproduces the full replayed log's centroid
  * BIT-IDENTICALLY, so the read
  * ([[Similarity.embeddingDriftFromCounts]] against a pinned
  * reference [[Similarity.centroidCounts]] snapshot) equals the
  * batch [[Similarity.embeddingDrift]] exactly (spec-pinned).
  *
  * Replay safety is [[SumStore]]'s overwrite-by-batch-id contract;
  * [[compactCounts]] folds the store to groups × dims rows. State is
  * groups × dims per batch — config-scale, no state store, no
  * watermark.
  */
object StreamingEmbedDrift {

  /** foreachBatch body: this batch's centroid partial, owned-by-path. */
  def writeBatch(batch: DataFrame, storePath: String, groupCol: String,
                 vecCol: String, batchId: Long): Unit =
    SumStore.writeBatch(
      Similarity.centroidCounts(batch, groupCol, vecCol)
        .withColumnRenamed(groupCol, "grp"),
      storePath, batchId)

  /** Wire a (group, vector) stream into a centroid-partial store. */
  def driftSink(stream: DataFrame, storePath: String, groupCol: String,
                vecCol: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, storePath, groupCol, vecCol, batchId)
    }

  /** Current sum-merged (grp, pos, qfx, n) centroid counts. */
  def centroidCounts(spark: SparkSession,
                     storePath: String): DataFrame =
    SumStore.merged(spark, storePath, Seq("grp", "pos"),
      Seq("qfx", "n"))

  /** The monitor's read: per-group centroid cosine of everything
    * landed against pinned reference counts (a persisted
    * [[Similarity.centroidCounts]] over the blessed corpus with its
    * group column named `grp`). Output as
    * [[Similarity.embeddingDrift]]: (grp, n_ref, n_cur,
    * centroid_cos).
    */
  def driftAgainstReference(spark: SparkSession, storePath: String,
                            refCounts: DataFrame): DataFrame =
    Similarity.embeddingDriftFromCounts(refCounts,
      centroidCounts(spark, storePath), "grp")

  /** Fold the store to one summed partition (groups × dims rows) —
    * maintenance window only ([[SumStore]] contract).
    */
  def compactCounts(spark: SparkSession, storePath: String): Unit =
    SumStore.compact(spark, storePath, Seq("grp", "pos"),
      Seq("qfx", "n"))
}
