package graft.streaming

import graft.functions.TextFns
import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingest-time corpus curation — the streaming twin of the batch
  * `ext_curate_corpus` composition (quality gate → exact dedup →
  * token annotation), so documents are filtered and deduplicated AS
  * THEY ARRIVE and downstream training-data stages never land the
  * rejects at all.
  *
  * Stage shapes on an unbounded stream:
  *  - quality gate: pure-Column scoring ([[TextAnalysis.qualityScore]]
  *    semantics via the same single-pass expression) — narrow, no
  *    state;
  *  - exact dedup: [[StreamingDedup.exactFirstSeen]] — state-store
  *    keyed by content hash, evicted `lateness` behind the watermark,
  *    so state is bounded by the dedup horizon, not corpus size;
  *  - annotation: token count as a narrow projection.
  *
  * Identities agree with the batch path by construction: the same
  * [[TextFns.normText]] normalization keys both, so a batch backfill
  * over the landed output reconciles 1:1 (same contract the DAU
  * dedup documents for the reference's Redis first-wins set).
  */
object StreamingCurate {

  /** Curate a document stream: drop docs scoring below `minQuality`,
    * suppress exact-content duplicates within `lateness` of first
    * sight, and annotate survivors with (quality, n_tokens). Column
    * set: input columns + quality + n_tokens.
    *
    * `tsCol` is the event-time column the dedup watermark rides on.
    */
  def curate(docs: DataFrame, textCol: String, tsCol: String,
             minQuality: Double, lateness: String = "24 hours"): DataFrame = {
    val scored = docs
      .withColumn("quality", TextAnalysis.qualityCol(col(textCol)))
      .filter(col("quality") >= minQuality)
    StreamingDedup.exactFirstSeen(scored, textCol, tsCol, lateness)
      .withColumn("n_tokens",
        size(TextFns.toks(col(textCol))).cast("long"))
  }
}
