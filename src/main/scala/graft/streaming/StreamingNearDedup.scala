package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest-time NEAR-duplicate suppression against a persisted, GROWING
  * MinHash index — the streaming twin of
  * [[graft.operators.Dedup.incrementalMinhashPairs]], and the
  * production shape for "never land a near-copy of anything we already
  * hold": each micro-batch computes signatures for its own docs only,
  * band-joins the index of everything landed so far, and appends the
  * survivors' signatures back — so batch N+1 automatically dedups
  * against batches 1..N without ever re-reading their text.
  *
  * Per-batch cost scales with the batch and the matched band buckets,
  * never the accumulated corpus; the index holds (did, sig, band)
  * rows — k longs + a band key per doc-band, no text.
  *
  * Replay safety: both the landed output and the index append are
  * written to a `batch=<id>` subdirectory with overwrite, so a batch
  * replayed after a crash rewrites its own directories byte-identically
  * instead of double-appending (same idempotency-by-path contract as
  * the keyed serving store's `__seq`). Readers take the directory root
  * (parquet partition discovery reads `batch=N` as a column).
  */
object StreamingNearDedup {

  /** Empty-index schema — batch 1 runs before any index exists. */
  private val indexSchema = StructType(Seq(
    StructField("did", LongType),
    StructField("sig", ArrayType(LongType, containsNull = false)),
    StructField("band", StringType)))

  /** Current index contents. `excludeBatch` drops one `batch=` partition
    * (partition-pruned, not scanned): a REPLAYED micro-batch must not
    * see its own earlier, pre-crash index append, or every one of its
    * docs would self-match and be dropped on the retry.
    */
  private[streaming] def readIndex(spark: SparkSession, path: String,
                                   excludeBatch: Option[Long] = None)
      : DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p) && fs.listStatus(p).nonEmpty) {
      val df = spark.read.parquet(path)
      excludeBatch.fold(df)(b => df.filter(col("batch") =!= b))
        .select(col("did"), col("sig"), col("band"))
    } else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], indexSchema)
  }

  /** One micro-batch of the gate, exposed for batch-parity testing:
    * returns the kept rows — docs that near-match neither a smaller-id
    * batch sibling nor anything in `index`.
    *
    * Within-batch policy is greedy min-id: pairs are emitted with
    * id_a < id_b, so dropping every doc that appears as `id_b`
    * keeps exactly the smallest id of every within-batch near-dup
    * chain (deterministic, no cluster resolution needed at batch
    * sizes).
    */
  private[streaming] def gateBatch(batch: DataFrame, index: DataFrame,
                                   idCol: String, textCol: String,
                                   n: Int, k: Int, bands: Int,
                                   threshold: Double): DataFrame = {
    val inBatchDups = Dedup.minhashLshPairs(batch, idCol, textCol,
        n, k, bands, threshold)
      .select(col("id_b").as(idCol)).distinct()
    val survivors = batch.join(inBatchDups, Seq(idCol), "left_anti")
    val vsIndex = Dedup.incrementalMinhashPairs(survivors, idCol,
        textCol, index, n, k, bands, threshold)
      .select(col("new_id").as(idCol)).distinct()
    survivors.join(vsIndex, Seq(idCol), "left_anti")
  }

  /** Collapse the per-micro-batch index directories into one base
    * partition (`batch=-1`) — at a 5 s trigger the sink creates ~17k
    * directories/day, and band-join planning degrades with file count
    * long before data size matters. Runs the serving store's staged
    * two-rename swap ([[Sinks.swapRewrite]]): a crash at any point
    * leaves a complete index recoverable by the next read/rewrite.
    *
    * `upToBatch` must be a batch id the streaming checkpoint has
    * COMMITTED: the one batch that can still replay after a crash must
    * keep its own `batch=` directory, or its replay's self-match
    * exclusion ([[readIndex]] `excludeBatch`) would stop seeing it.
    * Compacted rows sit at batch=-1, which no live batch id equals, so
    * they are visible to every exclusion filter. No-op if the index
    * does not exist yet.
    */
  def compactIndex(spark: SparkSession, indexPath: String,
                   upToBatch: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(indexPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p) && fs.listStatus(p).nonEmpty)
      Sinks.swapRewrite(spark, indexPath, "batch") { idx =>
        idx.withColumn("batch",
          when(col("batch").cast("long") <= upToBatch, lit(-1L))
            .otherwise(col("batch").cast("long")))
      }
  }

  /** Attach the near-dedup gate to a streaming document frame.
    * Survivors land under `outPath/batch=<id>/`; their banded
    * signatures append to `indexPath/batch=<id>/`. `idCol` must be a
    * bigint (the index `did` key).
    */
  def nearDedupSink(docs: DataFrame, idCol: String, textCol: String,
                    indexPath: String, outPath: String,
                    checkpoint: String,
                    n: Int = 3, k: Int = 24, bands: Int = 6,
                    threshold: Double = 0.5,
                    trigger: Trigger = Trigger.ProcessingTime("5 seconds"))
      : DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val spark = batch.sparkSession
        val kept = gateBatch(batch,
          readIndex(spark, indexPath, excludeBatch = Some(bid)),
          idCol, textCol, n, k, bands, threshold)
          // the batch feeds three consumers (two pair joins + the two
          // writes); one materialization, bounded by the micro-batch
          .localCheckpoint()
        kept.write.mode("overwrite").parquet(s"$outPath/batch=$bid")
        Dedup.minhashIndex(kept, idCol, textCol, n, k, bands)
          .write.mode("overwrite").parquet(s"$indexPath/batch=$bid")
        ()
      }
}
