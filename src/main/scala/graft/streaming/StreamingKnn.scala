package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Streaming twin of the incremental-ANN serving stack
  * ([[Similarity.ivfIndex]] / [[Similarity.ivfAppend]] /
  * [[Similarity.knnAgainstIndex]]) — the 100 TB embedding-INGESTION
  * pipeline as a foreachBatch sink: the IVF index is built ONCE over
  * the resident corpus ([[initIndex]] — centroids parquet + a
  * postings store), then every micro-batch of new vectors (a) probes
  * the index for its top-k neighbors over everything landed so far
  * and (b) files its own postings under the FIXED centroids — so the
  * corpus is never re-scanned, per-batch cost is |batch| ×
  * |centroids| assignment plus the cell-keyed probe equi-join, and
  * batch N+1 automatically retrieves against batches 1..N. The same
  * shape serves near-duplicate screening ("what do we already hold
  * that looks like this?") and retrieval-index freshness.
  *
  * Replay safety (the [[StreamingNearDedup]] contract): both the
  * neighbor output and the postings append land in `batch=<id>`
  * directories with overwrite, and the probe reads the postings store
  * EXCLUDING its own batch id — a batch replayed after a crash
  * rewrites its directories byte-identically instead of
  * double-appending or self-matching against its pre-crash postings.
  *
  * Centroids stay fixed forever by design (re-seeding would silently
  * re-cluster the store); monitor cell skew with
  * [[Similarity.ivfStats]] over the grown store and re-seed OFFLINE
  * via [[Similarity.ivfRebalance]] + an atomic store swap when the
  * load ratio drifts past the probe budget.
  */
object StreamingKnn {

  /** The initial build's postings directory id: far below any merge
    * target (`batch=-(upToBatch+1)`) so [[compactPostings]] can never
    * mistake the seed directory for a crashed merge's published
    * target, and below every live batch id so it is never excluded by
    * a replay filter.
    */
  private[streaming] val InitBatch = Long.MinValue

  /** Build the index over the resident corpus and persist it:
    * centroids at `centroidsPath`, postings under
    * `postingsPath/batch=<InitBatch>/`. Must run once before the sink
    * starts; the corpus must be non-empty (the seeds ARE the first
    * `cells` vectors).
    */
  def initIndex(corpus: DataFrame, idCol: String, vecCol: String,
                centroidsPath: String, postingsPath: String,
                cells: Int = 16): Unit = {
    val ix = Similarity.ivfIndex(corpus, idCol, vecCol, cells)
    ix.centroids.write.mode("overwrite").parquet(centroidsPath)
    ix.postings.write.mode("overwrite")
      .parquet(s"$postingsPath/batch=$InitBatch")
    ()
  }

  /** The persisted index as [[Similarity.IvfIndexFrames]].
    * `excludeBatch` drops one `batch=` partition (partition-pruned,
    * not scanned): a REPLAYED micro-batch must not probe its own
    * pre-crash postings append.
    */
  private[streaming] def readIndex(spark: SparkSession,
                                   centroidsPath: String,
                                   postingsPath: String,
                                   excludeBatch: Option[Long] = None)
      : Similarity.IvfIndexFrames = {
    val posts0 = spark.read.parquet(postingsPath)
    val posts = excludeBatch.fold(posts0)(b =>
      posts0.filter(col("batch") =!= b))
    Similarity.IvfIndexFrames(
      spark.read.parquet(centroidsPath),
      posts.select(col("neighbor_id"), col("cv"), col("cell")))
  }

  /** One micro-batch: probe then append from ONE fused cell
    * assignment ([[Similarity.knnAndAppend]] — the assignment is the
    * dominant per-batch CPU, and the two one-shot operators would
    * compute it twice; outputs are spec-pinned identical to
    * `knnAgainstIndex` + `ivfAppend`). Probe writes first: a crash
    * between the writes leaves a neighbor output whose replay
    * overwrites it byte-identically, and the probe's exclusion
    * filter already hides this batch's postings directory either
    * way.
    */
  private[streaming] def processBatch(batch: DataFrame, bid: Long,
                                      idCol: String, vecCol: String,
                                      centroidsPath: String,
                                      postingsPath: String,
                                      outPath: String,
                                      k: Int, nProbe: Int): Unit = {
    val spark = batch.sparkSession
    val ix = readIndex(spark, centroidsPath, postingsPath,
      excludeBatch = Some(bid))
    Similarity.knnAndAppend(ix, batch, idCol, vecCol, k, nProbe) {
      (neighbors, appended) =>
        neighbors.write.mode("overwrite")
          .parquet(s"$outPath/batch=$bid")
        appended.write.mode("overwrite")
          .parquet(s"$postingsPath/batch=$bid")
    }
  }

  /** Attach the probe-and-append sink to a streaming vector frame.
    * Per batch: top-`k` neighbors of each vector against everything
    * landed so far under `outPath/batch=<id>/`, the batch's own
    * postings appended under `postingsPath/batch=<id>/`. `idCol` must
    * be a bigint; [[initIndex]] must have run against the same paths.
    */
  def knnSink(vecs: DataFrame, idCol: String, vecCol: String,
              centroidsPath: String, postingsPath: String,
              outPath: String, checkpoint: String,
              k: Int = 5, nProbe: Int = 4,
              trigger: Trigger = Trigger.ProcessingTime("5 seconds"))
      : DataStreamWriter[Row] =
    vecs.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        processBatch(batch, bid, idCol, vecCol, centroidsPath,
          postingsPath, outPath, k, nProbe)
      }

  /** Merge the per-micro-batch postings directories — the
    * [[BatchDirs.compactInPlace]] in-place maintenance merge (see its
    * scaladoc for the concurrency/crash-safety contract) with this
    * store's row shape; the `distinct` heals duplicates from a crash
    * between a prior publish and its source deletes.
    */
  def compactPostings(spark: SparkSession, postingsPath: String,
                      upToBatch: Long): Unit =
    BatchDirs.compactInPlace(spark, postingsPath, upToBatch,
      _.select(col("neighbor_id"), col("cv"), col("cell")).distinct())
}
