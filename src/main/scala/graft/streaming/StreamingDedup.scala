package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming document dedup — the ingest-time half of the batch
  * [[graft.operators.Dedup]] family: suppress exact-content duplicates
  * as documents arrive, keeping the first occurrence (training-data
  * pipelines dedup at ingest so downstream stages never see the
  * duplicates at all).
  *
  * Content key = md5 of normalized text (same normalization as
  * `Dedup.exact`, so batch backfills and the stream agree on identity).
  * State lives in the state store keyed by content hash and evicts
  * `lateness` behind the watermark.
  */
object StreamingDedup {

  /** First-seen filter on exact content. `tsCol` must be castable to
    * timestamp; duplicates arriving within `lateness` of the original
    * are suppressed, later ones are the caller's policy decision (state
    * has evicted — typically reconciled by a periodic batch dedup).
    */
  def exactFirstSeen(docs: DataFrame, textCol: String, tsCol: String,
                     lateness: String = "24 hours"): DataFrame =
    docs
      .withColumn("__content_hash",
        md5(graft.functions.TextFns.normText(col(textCol))))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("__content_hash")
      .drop("__content_hash")
}
