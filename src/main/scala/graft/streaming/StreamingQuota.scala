package graft.streaming

import graft.functions.TextFns
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.{DataFrame, Row}

/** Cross-batch token-budget ADMISSION — the streaming twin of
  * [[graft.operators.Corpus.tokenQuotaByGroup]]: a continuously-
  * ingesting corpus feed admits each group's (source's) documents only
  * while the group's CUMULATIVE admitted token count across every
  * micro-batch so far stays inside its budget, then shuts the gate —
  * the ingestion-time mixture control a training-data pipeline runs so
  * an over-crawled source cannot flood the corpus between curation
  * runs.
  *
  * Batch-form parity: within one batch the selection is exactly
  * `tokenQuotaByGroup`'s — deterministic md5-priority order, greedy
  * fill, the budget-CROSSING document kept — with the window's running
  * sum offset by the group's previously-admitted total. Replaying the
  * whole stream as ONE batch therefore admits the superset; per-batch
  * arrival can only re-order which documents fill the budget (earlier
  * batches fill first — that is the point of an admission gate).
  *
  * Replay-stable: previous spend is read through
  * [[SumStore.mergedExcludingIfExists]] (own batch directory excluded,
  * own partial overwritten), so an at-least-once redelivery recomputes
  * the identical admit set. [[compactSpent]] folds the partials;
  * maintenance window only, like every SumStore fold.
  *
  * Scale shape per batch: one store-sized rollup (O(groups ×
  * batches-since-fold), incremental by construction), one broadcast-
  * able group-keyed join of the batch against ≤ |groups| spent rows,
  * and ONE hash-partitioned window per group on BATCH rows only — the
  * corpus is never rescanned.
  */
object StreamingQuota {

  private val SumCols = Seq("admitted_tokens")

  /** foreachBatch body: this batch's admitted rows (with `n_tokens`
    * and the group's global inclusive `cum_tokens`), spend recorded
    * owned-by-path.
    */
  def admitAndRecord(batch: DataFrame, groupCol: String, idCol: String,
                     textCol: String, tokenBudget: Long,
                     storePath: String, batchId: Long): DataFrame = {
    require(batchId >= 0, s"batch ids are >= 0, got $batchId")
    require(tokenBudget >= 0, s"tokenBudget must be >= 0, got $tokenBudget")
    val spark = batch.sparkSession
    val spent = SumStore.mergedExcludingIfExists(spark, storePath,
      Seq(groupCol), SumCols, batchId)
    val withSpent = spent match {
      case Some(p) => batch.join(
          broadcast(p.withColumnRenamed("admitted_tokens", "__spent")),
          Seq(groupCol), "left_outer")
        .withColumn("__spent", coalesce(col("__spent"), lit(0L)))
      case None => batch.withColumn("__spent", lit(0L))
    }
    val w = Window.partitionBy(col(groupCol))
      .orderBy(TextFns.hash32(col(idCol).cast("string")), col(idCol))
    val admitted = withSpent
      .withColumn("n_tokens",
        size(TextFns.toks(col(textCol))).cast("long"))
      .withColumn("cum_tokens", col("__spent") + sum(col("n_tokens"))
        .over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .filter(col("cum_tokens") - col("n_tokens") < tokenBudget)
      .drop("__spent")
      .localCheckpoint() // the spend read must finish BEFORE the
                         // overwrite below rewrites this batch's dir
    SumStore.writeBatch(
      admitted.groupBy(col(groupCol))
        .agg(sum(col("n_tokens")).as("admitted_tokens")),
      storePath, batchId)
    admitted
  }

  /** Wire a document stream into an admission-gated sink: admitted
    * rows flow to `emit`, spend partials to the store.
    */
  def quotaSink(stream: DataFrame, groupCol: String, idCol: String,
                textCol: String, tokenBudget: Long, storePath: String)(
      emit: DataFrame => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      emit(admitAndRecord(batch, groupCol, idCol, textCol, tokenBudget,
        storePath, batchId))
    }

  /** Current per-group admitted token totals. */
  def spentTokens(spark: org.apache.spark.sql.SparkSession,
                  storePath: String, groupCol: String): DataFrame =
    SumStore.merged(spark, storePath, Seq(groupCol), SumCols)

  /** Fold the spend store (see [[SumStore.compact]]). */
  def compactSpent(spark: org.apache.spark.sql.SparkSession,
                   storePath: String, groupCol: String): Unit =
    SumStore.compact(spark, storePath, Seq(groupCol), SumCols)
}
