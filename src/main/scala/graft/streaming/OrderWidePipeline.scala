package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Order wide-table pipeline (reference DwdOrderApp.scala): the
  * info⋈detail dual-stream join with 24 h cross-batch completion.
  *
  * The reference implements this as a per-batch fullOuterJoin plus a
  * hand-rolled Redis pending-cache with 24 h TTL (DwdOrderApp.scala:
  * 174-254). Net semantics — each (info, detail) pair on order_id is
  * emitted exactly once if both sides arrive within 24 h of each
  * other, 1:N supported, never-matched rows never emitted — are
  * exactly a Structured Streaming stream-stream INNER join with
  * symmetric 24 h watermarks and a time-range condition, so that's the
  * whole implementation. State eviction, late-data bounds, and restart
  * recovery come from the state store + checkpoint.
  */
object OrderWidePipeline {

  /** Join order_info and order_detail streams into the wide row.
    *
    * Both inputs must carry an event-time column named `create_ts`
    * (derive with `to_timestamp(create_time)`); `maxDelay` is the
    * cross-arrival bound (reference TTL: 24 h).
    */
  def orderWide(info: DataFrame, detail: DataFrame,
                maxDelay: String = "24 hours"): DataFrame = {
    val i = info.withWatermark("create_ts", maxDelay).alias("i")
    val d = detail.withWatermark("create_ts", maxDelay).alias("d")
    i.join(d,
      expr(s"""
        i.id = d.order_id AND
        d.create_ts >= i.create_ts - INTERVAL 24 HOURS AND
        d.create_ts <= i.create_ts + INTERVAL 24 HOURS
      """),
      "inner")
  }

  /** Batch shadow of [[orderWide]] for oracle testing: same columns,
    * plain inner join (batch data is complete, no lateness).
    */
  def orderWideBatch(info: DataFrame, detail: DataFrame): DataFrame =
    info.alias("i").join(detail.alias("d"),
      col("i.id") === col("d.order_id"), "inner")
}
