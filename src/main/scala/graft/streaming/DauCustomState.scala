package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state variant of the DAU dedup (SURVEY §2.10: the
  * `flatMapGroupsWithState` fallback for when eviction-at-midnight
  * semantics must be exact rather than watermark-approximate).
  *
  * The production path is `DauPipeline.dedupDailyStreaming`
  * (dropDuplicatesWithinWatermark — state-store native, no user code);
  * this variant demonstrates the engine's custom-state toolkit: keyed
  * boolean first-seen state with an event-time timeout pinned to
  * day-end + lateness, so each (mid, day) key's state is removed at
  * exactly the moment the reference's Redis TTL intended.
  */
object DauCustomState {

  case class StartEvent(mid: String, user_id: String, ts: Long)
  case class DauFirst(mid: String, user_id: String, ts: Long, dt: String)

  private val dayMs = 86400000L

  private def dtOf(ts: Long): String =
    java.time.Instant.ofEpochMilli(ts)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString

  /** First event per (mid, day) with exact day-end+24 h state removal.
    * Input must be watermarked on `event_ts` by the caller (required
    * for EventTimeTimeout).
    */
  def dedupExact(starts: Dataset[StartEvent]): Dataset[DauFirst] = {
    implicit val outEnc = Encoders.product[DauFirst]
    implicit val keyEnc = Encoders.product[(String, String)]
    implicit val stateEnc = Encoders.scalaBoolean
    starts
      .groupByKey(e => (e.mid, dtOf(e.ts)))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (key: (String, String), rows: Iterator[StartEvent],
         state: GroupState[Boolean]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            Iterator.empty // key already emitted this day
          } else {
            val first = rows.minBy(e => (e.ts, e.user_id))
            state.update(true)
            // evict at day end + 24 h lateness allowance (the
            // reference's Redis TTL intent, DwdDauApp.scala:94)
            val dayStart = java.time.LocalDate.parse(key._2)
              .atStartOfDay(java.time.ZoneOffset.UTC)
              .toInstant.toEpochMilli
            state.setTimeoutTimestamp(dayStart + 2 * dayMs)
            Iterator.single(
              DauFirst(first.mid, first.user_id, first.ts, key._2))
          }
        })
  }
}
