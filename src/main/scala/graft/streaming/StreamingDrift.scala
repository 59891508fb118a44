package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.operators.Stats

/** Streaming score-distribution drift monitor — PSI at INGEST time,
  * where drift detection actually pays (a batch
  * [[Stats.psi]] report over last week's landed data tells you a week
  * late that a source went bad; this sink tells you within a
  * micro-batch trigger). Composition, not a new operator: each
  * micro-batch's [[Stats.binCounts]] (the EXACT binning expression the
  * batch PSI uses) lands as a [[SumStore]] partial, and the reader
  * feeds the sum-merged counts plus a PINNED reference snapshot to
  * [[Stats.psiFromCounts]] — so the streamed PSI is provably equal,
  * bin for bin and term for term, to the batch `psi` over the
  * replayed log (StreamingDriftSpec pins it).
  *
  * Replay safety is [[SumStore]]'s: counts SUM across batches, so each
  * batch's partial OVERWRITES its own `batch=<id>` directory and an
  * at-least-once redelivery rewrites identical bytes — never
  * double-counts. [[compactCounts]] folds the store to ≤ `bins` rows
  * (same maintenance-window contract as every SumStore fold).
  *
  * The reference snapshot is the caller's to pin: run
  * [[Stats.binCounts]] once over the blessed reference corpus with the
  * SAME (bins, lo, hi) and persist it; comparing against a drifting
  * reference would define drift away.
  *
  * Scale shape: per batch ONE bin-keyed map-side hash agg over the
  * micro-batch (≤ `bins` rows written); the read is a ≤
  * bins×batches-row store scan folded to `bins` rows plus
  * [[Stats.psiFromCounts]]'s spine join — nothing keyed by corpus
  * size anywhere, no state store at all (the parquet store IS the
  * state, CRDT-merged by summation).
  */
object StreamingDrift {

  /** foreachBatch body: this batch's bin counts, owned-by-path. */
  def writeBatch(batch: DataFrame, storePath: String, scoreCol: String,
                 bins: Int, lo: Double, hi: Double,
                 batchId: Long): Unit =
    SumStore.writeBatch(
      Stats.binCounts(batch, scoreCol, bins, lo, hi),
      storePath, batchId)

  /** Wire a score stream into a binned-count drift store. */
  def driftSink(stream: DataFrame, storePath: String, scoreCol: String,
                bins: Int = 10, lo: Double = 0.0,
                hi: Double = 1.0): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, storePath, scoreCol, bins, lo, hi, batchId)
    }

  /** Current sum-merged (bin, n) counts over everything landed. */
  def binnedCounts(spark: SparkSession, storePath: String): DataFrame =
    SumStore.merged(spark, storePath, Seq("bin"), Seq("n"))

  /** The monitor's read: PSI of the landed distribution against the
    * pinned reference counts (a persisted [[Stats.binCounts]] over the
    * blessed corpus, same bins/range). Same output schema and
    * fixed-point terms as the batch [[Stats.psi]]; the scalar PSI is
    * `sum(term_fx)/1e9`.
    */
  def psiAgainstReference(spark: SparkSession, storePath: String,
                          refCounts: DataFrame, bins: Int): DataFrame =
    Stats.psiFromCounts(refCounts, binnedCounts(spark, storePath), bins)

  /** Fold the store to one summed partition (≤ `bins` rows) — run
    * from a maintenance window with the stream stopped ([[SumStore]]
    * contract).
    */
  def compactCounts(spark: SparkSession, storePath: String): Unit =
    SumStore.compact(spark, storePath, Seq("bin"), Seq("n"))

  // ---- exact (binning-free) KS drift over the same stream ----------
  //
  // The PSI store above bins; a shift smaller than a bin is invisible
  // to it. The KS store keeps per-DISTINCT-SCORE counts (scores are
  // fixed-point by engine convention, so the value space is bounded
  // by the quantization, not the corpus) and the read is the exact
  // [[Stats.ksTest]] against a pinned reference — same SumStore
  // replay/compaction contract, same provable streamed ≡ batch
  // equality (counts SUM-merge losslessly).

  /** foreachBatch body: this batch's per-score counts, owned-by-path.
    * `scoreFxCol` must be integral ([[Stats.scoreCounts]]).
    */
  def writeScoreCounts(batch: DataFrame, storePath: String,
                       scoreFxCol: String, batchId: Long): Unit =
    SumStore.writeBatch(Stats.scoreCounts(batch, scoreFxCol),
      storePath, batchId)

  /** Wire a fixed-point score stream into a per-score count store. */
  def ksSink(stream: DataFrame, storePath: String,
             scoreFxCol: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        writeScoreCounts(batch, storePath, scoreFxCol, batchId)
    }

  /** Current sum-merged (s, n) score counts over everything landed. */
  def scoreCounts(spark: SparkSession, storePath: String): DataFrame =
    SumStore.merged(spark, storePath, Seq("s"), Seq("n"))

  /** Exact KS of the landed distribution against pinned reference
    * counts (a persisted [[Stats.scoreCounts]]) — output as
    * [[Stats.ksTest]]: (n_ref, n_cur, d, ks_at).
    */
  def ksAgainstReference(spark: SparkSession, storePath: String,
                         refCounts: DataFrame): DataFrame =
    Stats.ksTestFromCounts(refCounts, scoreCounts(spark, storePath))

  /** Fold the KS store to one row per distinct score — maintenance
    * window only ([[SumStore]] contract).
    */
  def compactScoreCounts(spark: SparkSession, storePath: String): Unit =
    SumStore.compact(spark, storePath, Seq("s"), Seq("n"))

  /** Exact 1-Wasserstein distance of the landed distribution against
    * pinned reference counts — a SECOND alarm off the SAME per-score
    * count store [[ksSink]] feeds (no new write path): KS flags the
    * worst local CDF gap, W1 the total mass moved. Output as
    * [[Stats.wasserstein1]]: (n_ref, n_cur, w1).
    */
  def w1AgainstReference(spark: SparkSession, storePath: String,
                         refCounts: DataFrame): DataFrame =
    Stats.wasserstein1FromCounts(refCounts,
      scoreCounts(spark, storePath))

  // ---- PER-SOURCE twins ---------------------------------------------
  //
  // The global monitors above answer "did the corpus drift"; the
  // commonest real alarm is "did SOURCE X go bad" — visible per-source
  // long before it moves the pooled distribution (a 5 % source can
  // collapse entirely inside global noise). The batch scorecards
  // ([[Stats.psiByGroup]], [[Stats.ksTestByGroup]]) already exist;
  // these stores just carry the group key through the same SumStore
  // partials — the key set gains one column, the replay/compaction
  // contract and the provable streamed ≡ batch equality (counts
  // SUM-merge losslessly, shared binning/count expressions, shared
  // FromCounts readers) are unchanged.

  /** foreachBatch body: this batch's per-(group, bin) counts. */
  def writeBatchBy(batch: DataFrame, storePath: String,
                   groupCol: String, scoreCol: String, bins: Int,
                   lo: Double, hi: Double, batchId: Long): Unit =
    SumStore.writeBatch(
      Stats.binCountsBy(batch, groupCol, scoreCol, bins, lo, hi),
      storePath, batchId)

  /** Wire a (source, score) stream into a per-source binned-count
    * drift store.
    */
  def driftSinkBy(stream: DataFrame, storePath: String,
                  groupCol: String, scoreCol: String, bins: Int = 10,
                  lo: Double = 0.0,
                  hi: Double = 1.0): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        writeBatchBy(batch, storePath, groupCol, scoreCol, bins, lo,
          hi, batchId)
    }

  /** Current sum-merged (group, bin, n) counts over everything
    * landed.
    */
  def binnedCountsBy(spark: SparkSession, storePath: String,
                     groupCol: String): DataFrame =
    SumStore.merged(spark, storePath, Seq(groupCol, "bin"), Seq("n"))

  /** Per-source PSI scorecard of the landed distributions against
    * pinned per-source reference counts (a persisted
    * [[Stats.binCountsBy]] over the blessed corpus, same bins/range).
    * Output as [[Stats.psiByGroup]]: one row per (group, bin); the
    * per-group scalar is `sum(term_fx)/1e9 GROUP BY group`.
    */
  def psiByGroupAgainstReference(spark: SparkSession, storePath: String,
                                 refCounts: DataFrame, groupCol: String,
                                 bins: Int): DataFrame =
    Stats.psiByGroupFromCounts(refCounts,
      binnedCountsBy(spark, storePath, groupCol), groupCol, bins)

  /** Fold the per-source PSI store to ≤ |groups|·bins rows —
    * maintenance window only ([[SumStore]] contract).
    */
  def compactCountsBy(spark: SparkSession, storePath: String,
                      groupCol: String): Unit =
    SumStore.compact(spark, storePath, Seq(groupCol, "bin"), Seq("n"))

  /** foreachBatch body: this batch's per-(group, score) counts.
    * `scoreFxCol` must be integral ([[Stats.scoreCountsBy]]).
    */
  def writeScoreCountsBy(batch: DataFrame, storePath: String,
                         groupCol: String, scoreFxCol: String,
                         batchId: Long): Unit =
    SumStore.writeBatch(Stats.scoreCountsBy(batch, groupCol, scoreFxCol),
      storePath, batchId)

  /** Wire a (source, fixed-point score) stream into a per-source
    * score-count store.
    */
  def ksSinkBy(stream: DataFrame, storePath: String, groupCol: String,
               scoreFxCol: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        writeScoreCountsBy(batch, storePath, groupCol, scoreFxCol,
          batchId)
    }

  /** Current sum-merged (group, s, n) score counts over everything
    * landed.
    */
  def scoreCountsBy(spark: SparkSession, storePath: String,
                    groupCol: String): DataFrame =
    SumStore.merged(spark, storePath, Seq(groupCol, "s"), Seq("n"))

  /** Per-source exact KS scorecard of the landed distributions
    * against pinned per-source reference counts (a persisted
    * [[Stats.scoreCountsBy]]) — output as [[Stats.ksTestByGroup]]:
    * (group, n_ref, n_cur, d, ks_at), d null when a source is missing
    * from one side (the appeared/vanished alarm).
    */
  def ksByGroupAgainstReference(spark: SparkSession, storePath: String,
                                refCounts: DataFrame,
                                groupCol: String): DataFrame =
    Stats.ksTestByGroupFromCounts(refCounts,
      scoreCountsBy(spark, storePath, groupCol), groupCol)

  /** Fold the per-source KS store to one row per (group, distinct
    * score) — maintenance window only ([[SumStore]] contract).
    */
  def compactScoreCountsBy(spark: SparkSession, storePath: String,
                           groupCol: String): Unit =
    SumStore.compact(spark, storePath, Seq(groupCol, "s"), Seq("n"))

  /** Per-source exact W1 scorecard off the SAME per-(group, score)
    * store [[ksSinkBy]] feeds — output as
    * [[Stats.wasserstein1ByGroup]]: (group, n_ref, n_cur, w1).
    */
  def w1ByGroupAgainstReference(spark: SparkSession, storePath: String,
                                refCounts: DataFrame,
                                groupCol: String): DataFrame =
    Stats.wasserstein1ByGroupFromCounts(refCounts,
      scoreCountsBy(spark, storePath, groupCol), groupCol)

  // ---- CATEGORICAL drift (chi-squared) ------------------------------
  //
  // PSI/KS/W1 monitor an ORDERED score; language/source/license/format
  // have no order to cumulate. Same SumStore partial pattern over
  // per-category counts; the read is the exact two-sample chi-squared
  // homogeneity test against a pinned reference.

  /** foreachBatch body: this batch's per-category counts. */
  def writeCatCounts(batch: DataFrame, storePath: String,
                     catCol: String, batchId: Long): Unit =
    SumStore.writeBatch(Stats.catCounts(batch, catCol), storePath,
      batchId)

  /** Wire a categorical stream into a per-category count store. */
  def catSink(stream: DataFrame, storePath: String,
              catCol: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        writeCatCounts(batch, storePath, catCol, batchId)
    }

  /** Current sum-merged (cat, n) counts over everything landed. */
  def catCountsMerged(spark: SparkSession, storePath: String,
                      catCol: String): DataFrame =
    SumStore.merged(spark, storePath, Seq(catCol), Seq("n"))

  /** Chi-squared homogeneity of the landed categorical mix against
    * pinned reference counts (a persisted [[Stats.catCounts]]) —
    * output as [[Stats.chiSquaredDrift]]: (n_ref, n_cur, n_cats, df,
    * chi2, cramers_v).
    */
  def chi2AgainstReference(spark: SparkSession, storePath: String,
                           refCounts: DataFrame,
                           catCol: String): DataFrame =
    Stats.chiSquaredDriftFromCounts(refCounts,
      catCountsMerged(spark, storePath, catCol), catCol)

  /** Fold the categorical store to ≤ |categories| rows — maintenance
    * window only ([[SumStore]] contract).
    */
  def compactCatCounts(spark: SparkSession, storePath: String,
                       catCol: String): Unit =
    SumStore.compact(spark, storePath, Seq(catCol), Seq("n"))

  /** foreachBatch body: this batch's per-(group, category) counts. */
  def writeCatCountsBy(batch: DataFrame, storePath: String,
                       groupCol: String, catCol: String,
                       batchId: Long): Unit =
    SumStore.writeBatch(Stats.catCountsBy(batch, groupCol, catCol),
      storePath, batchId)

  /** Wire a (source, category) stream into a per-source
    * category-count store.
    */
  def catSinkBy(stream: DataFrame, storePath: String,
                groupCol: String, catCol: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        writeCatCountsBy(batch, storePath, groupCol, catCol, batchId)
    }

  /** Current sum-merged (group, cat, n) counts over everything
    * landed.
    */
  def catCountsMergedBy(spark: SparkSession, storePath: String,
                        groupCol: String, catCol: String): DataFrame =
    SumStore.merged(spark, storePath, Seq(groupCol, catCol), Seq("n"))

  /** Per-source chi-squared scorecard of the landed categorical
    * mixes against pinned per-source reference counts (a persisted
    * [[Stats.catCountsBy]]) — output as
    * [[Stats.chiSquaredDriftByGroup]].
    */
  def chi2ByGroupAgainstReference(spark: SparkSession,
                                  storePath: String,
                                  refCounts: DataFrame,
                                  groupCol: String,
                                  catCol: String): DataFrame =
    Stats.chiSquaredDriftByGroupFromCounts(refCounts,
      catCountsMergedBy(spark, storePath, groupCol, catCol),
      groupCol, catCol)

  /** Fold the per-source categorical store — maintenance window only
    * ([[SumStore]] contract).
    */
  def compactCatCountsBy(spark: SparkSession, storePath: String,
                         groupCol: String, catCol: String): Unit =
    SumStore.compact(spark, storePath, Seq(groupCol, catCol), Seq("n"))
}
