package graft.streaming

import java.io.IOException

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** In-place maintenance merge for the `batch=<id>`-partitioned parquet
  * stores the streaming sinks append to (the near-dedup MinHash index,
  * the incremental-ANN postings store): at a 5 s trigger a sink
  * creates ~17k directories/day, and join planning degrades with file
  * count long before data size matters.
  *
  * The merge is IN PLACE under the store root: every `batch=<b>`
  * directory with b ≤ `upToBatch` (including prior merges, which live
  * at negative ids) is rewritten into one `batch=-(upToBatch+1)`
  * directory, then the covered sources are deleted. The root itself is
  * never renamed or replaced, so:
  *
  *  - a CONCURRENT live stream's APPENDS are safe: they land at batch
  *    ids > `upToBatch` (ids the checkpoint has not committed yet) and
  *    are never listed, read, or deleted by the merge. Its READS are
  *    not: a micro-batch that planned its parquet scan of the store
  *    before the merge's source deletes fails mid-job with
  *    missing-file errors when the deletes land
  *    (`spark.sql.files.ignoreMissingFiles` is false by default; the
  *    stream's retry replans and heals, but at the cost of a failed
  *    attempt). Run the merge in a maintenance window — between
  *    micro-batches, or with the stream stopped — exactly like
  *    [[SumStore]]'s compact; or set `ignoreMissingFiles` on the
  *    store-reading session if concurrent merges are required;
  *  - the store is never missing or partial: the staging write is
  *    dot-prefixed (invisible to parquet listing) and the publish is
  *    one rename. A crash BETWEEN the publish and the source deletes
  *    leaves duplicate rows until the merge is re-run — harmless to
  *    existence-check consumers (the near-dedup gate's semi-joins),
  *    but NOT to top-k consumers, where a duplicated neighbor occupies
  *    two ranks and displaces the true k-th ([[StreamingKnn]]'s
  *    probe). Top-k readers detect the window with
  *    [[crashedMergeDups]] and dedup only when it is open.
  *
  * Re-running after any crash completes the merge: a surviving staging
  * dir is discarded, an already-published target flips the call to
  * cleanup-only. `upToBatch` must be a batch id the streaming
  * checkpoint has COMMITTED: the one batch that can still replay after
  * a crash must keep its own `batch=` directory, or its replay's
  * self-match exclusion (the readers' `excludeBatch`) would stop
  * seeing it. Merged rows sit at negative batch ids, which no live
  * batch id equals, so they stay visible to every exclusion filter.
  * No-op if the store does not exist or holds at most one covered
  * directory.
  */
private[streaming] object BatchDirs {

  /** The store's `batch=<id>` directories as (id, path) — the ONE
    * parser of the partition naming scheme (merge, crash detection
    * and the rebalance swap all list the same layout). Non-`batch=`
    * and non-numeric names are ignored (staging dirs are
    * dot-prefixed and never match).
    */
  private[streaming] def listBatchIds(fs: org.apache.hadoop.fs.FileSystem,
                                      root: Path): Seq[(Long, Path)] =
    fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(_.getName.startsWith("batch="))
      .flatMap(p => scala.util.Try(
        p.getName.stripPrefix("batch=").toLong).toOption.map(_ -> p))

  /** True when a crashed merge's duplicate window is OPEN: some merge
    * target `batch=-(u+1)` exists alongside a surviving covered source
    * (any other directory with id ≤ u) — the state left by a crash
    * between [[compactInPlace]]'s publish rename and its source
    * deletes, in which every row of the surviving sources also exists
    * inside the target. Exact-rank consumers (top-k probes) dedup
    * their read when this is true; re-running the merge closes the
    * window. One filesystem listing, no data read. The store's seed
    * directory (`batch=Long.MinValue`, [[StreamingKnn.InitBatch]]) is
    * never itself a merge target — merge ids are `-(u+1)` for a
    * committed u ∈ [0, MaxValue) — but it IS a coverable source.
    */
  def crashedMergeDups(spark: SparkSession, rootPath: String): Boolean = {
    val root = new Path(rootPath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return false
    val ids = listBatchIds(fs, root).map(_._1)
    ids.exists { t =>
      t < 0 && t != Long.MinValue &&
        ids.exists(s => s != t && s <= -(t + 1))
    }
  }

  /** Merge as described above; `project` selects/dedups the store's
    * row shape (it must drop the discovered `batch` column).
    */
  def compactInPlace(spark: SparkSession, rootPath: String,
                     upToBatch: Long,
                     project: DataFrame => DataFrame): Unit = {
    // -(Long.MaxValue + 1) would overflow to Long.MinValue — exactly
    // StreamingKnn's seed-directory id — and the crashed-merge
    // cleanup branch would then delete every source without merging.
    // Real batch ids are checkpoint-assigned small longs; reject the
    // boundary instead of corrupting the store.
    require(upToBatch < Long.MaxValue,
      "upToBatch must be a committed batch id, not Long.MaxValue")
    val root = new Path(rootPath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return
    val target = new Path(root, s"batch=${-(upToBatch + 1)}")
    val covered = listBatchIds(fs, root)
      .filter(_._1 <= upToBatch).map(_._2)
    // compare by name: listStatus paths are scheme-qualified, target
    // is not — URI equality would silently keep the target in sources
    val sources = covered.filterNot(_.getName == target.getName)
    if (fs.exists(target)) {
      // a prior merge to this same target crashed after its publish
      // rename: only the source cleanup remains
      sources.foreach(fs.delete(_, true))
    } else if (sources.size > 1) {
      val tmp = new Path(root, ".__merge_tmp")
      fs.delete(tmp, true) // stale staging from a crash mid-write
      project(spark.read.parquet(sources.map(_.toString): _*))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(tmp.toString)
      if (!fs.rename(tmp, target))
        throw new IOException(s"store merge: cannot publish $target")
      sources.foreach(fs.delete(_, true))
    }
  }
}
