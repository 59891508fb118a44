package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming sessionization — the ingest-time half of the batch
  * [[graft.operators.Temporal.sessionize]]: roll events into gap-based
  * sessions as they arrive, using Spark's native `session_window`
  * (dynamic-gap merging inside the state store, closed and emitted
  * once the watermark passes the session end + gap).
  *
  * Batch/stream identity: both define a session break as
  * `gap_between_consecutive_events > gap`, so a closed streaming
  * session's (start, end, count) equals one batch session's bounds
  * over the same events — [[graft.operators.Temporal.sessionStats]]
  * on the backfill reconciles 1:1 with this stream's output (modulo
  * events later than the watermark, which the state store has
  * evicted; `StreamingPipelinesSpec` pins the agreement).
  */
object StreamingSessionize {

  /** Per-(key, session) rollup: emits one row per CLOSED session with
    * `session_start`/`session_end` (the window bounds), `n_events` and
    * `first_ord`. `tsCol` must be a timestamp column; `gap` is a
    * calendar-interval string (e.g. "30 minutes").
    *
    * Append-mode safe: rows emit only when the watermark closes the
    * session, so each session appears exactly once.
    */
  def sessions(events: DataFrame, keyCol: String, tsCol: String,
               ordCol: String, gap: String,
               lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(ordCol)).as("first_ord"),
        min(col(tsCol)).as("session_start_ts"),
        max(col(tsCol)).as("session_end_ts"))
      .select(col(keyCol),
        col("session_window.start").as("window_start"),
        col("session_window.end").as("window_end"),
        col("n_events"), col("first_ord"),
        col("session_start_ts"), col("session_end_ts"))

  /** The batch shadow of [[sessions]] for reconciliation jobs: same
    * output schema, computed with the batch operator. `tsUsCol` is
    * epoch-micros (the batch side's exact-integer timestamp).
    */
  def sessionsBatch(events: DataFrame, keyCol: String, tsUsCol: String,
                    ordCol: String, gapUs: Long): DataFrame = {
    def ts(c: Column): Column = timestamp_micros(c)
    graft.operators.Temporal.sessionStats(
      graft.operators.Temporal.sessionize(events, keyCol, tsUsCol,
        ordCol, gapUs),
      keyCol, tsUsCol, ordCol)
      .select(col(keyCol),
        ts(col("start_ts")).as("window_start"),
        // session_window's end bound is last-event + gap
        ts(col("end_ts") + gapUs).as("window_end"),
        col("n_events"), col("first_ord"),
        ts(col("start_ts")).as("session_start_ts"),
        ts(col("end_ts")).as("session_end_ts"))
  }
}
