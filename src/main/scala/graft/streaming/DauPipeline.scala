package graft.streaming

import graft.functions.Cols
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Daily-active-users pipeline (reference DwdDauApp.scala): session-
  * start filter → first-visit-per-device-per-day dedup → dimension
  * enrichment.
  *
  * The reference's Redis SADD test-and-set (DwdDauApp.scala:87-135)
  * becomes `withWatermark(24h) + dropDuplicates(mid, dt)` — the state
  * store is partitioned by key, so first-wins needs no external
  * coordination, and the 24 h watermark bounds state exactly like the
  * reference's intended Redis TTL (comment at :94). Its ES read-back
  * restart path (revertState, :238-260) disappears: checkpointing
  * restores dedup state natively.
  */
object DauPipeline {

  /** Session starts only: the reference's "self-audit" pre-filter
    * (last_page_id == null, DwdDauApp.scala:78-80).
    */
  def sessionStarts(pages: DataFrame): DataFrame =
    pages.filter(col("last_page_id").isNull)

  /** First event per (mid, event-date), batch form: plain keyed
    * first-wins dropDuplicates.
    */
  def dedupDaily(starts: DataFrame): DataFrame =
    starts
      .withColumn("event_ts", timestamp_millis(col("ts")))
      .withColumn("dt", Cols.dt(col("event_ts")))
      .withColumn("hr", Cols.hr(col("event_ts")))
      .dropDuplicates("mid", "dt")

  /** Streaming form: `dropDuplicatesWithinWatermark` on (mid, dt) with
    * the watermarked event-time column KEPT in the frame — this is what
    * makes per-key state evictable once the watermark passes (plain
    * dropDuplicates without the event-time column in the subset keeps
    * state forever → unbounded growth). 24 h lateness bound = the
    * reference's intended Redis TTL (DwdDauApp.scala:94).
    */
  def dedupDailyStreaming(starts: DataFrame,
                          maxLateness: String = "24 hours"): DataFrame =
    starts
      .withColumn("event_ts", timestamp_millis(col("ts")))
      .withWatermark("event_ts", maxLateness)
      .withColumn("dt", Cols.dt(col("event_ts")))
      .withColumn("hr", Cols.hr(col("event_ts")))
      .dropDuplicatesWithinWatermark("mid", "dt")

  /** Full streaming DAU wide-row: watermarked dedup + user/province dim
    * enrichment (broadcast joins against slowly-changing dim snapshots,
    * reference J1/J2 at DwdDauApp.scala:149-185).
    *
    * `dimUser(id, gender, birthday, ...)`, `dimProvince(id, name,
    * area_code, iso_code, iso_3166_2)` are batch dim tables maintained
    * by [[CdcSplit.dims]].
    */
  def dau(pages: DataFrame, dimUser: DataFrame,
          dimProvince: DataFrame): DataFrame = {
    val deduped =
      if (pages.isStreaming) dedupDailyStreaming(sessionStarts(pages))
      else dedupDaily(sessionStarts(pages))
    enrich(deduped, dimUser, dimProvince)
  }

  /** The dim-enrichment half of [[dau]] alone — called per micro-batch
    * by the runner so each batch joins against freshly-read dims.
    */
  def enrich(deduped: DataFrame, dimUser: DataFrame,
             dimProvince: DataFrame): DataFrame = {
    deduped
      .join(broadcast(dimUser).as("u"),
        deduped("user_id") === col("u.id"), "left")
      .withColumn("user_gender", col("u.gender"))
      .withColumn("user_age",
        Cols.ageYears(current_date(), to_date(col("u.birthday"))))
      // NB: Column-based drops — string drop("u.id") matches only
      // unqualified names and would silently keep both id columns
      .drop(col("u.id")).drop(col("u.gender")).drop(col("u.birthday"))
      .join(broadcast(dimProvince).as("p"),
        deduped("province_id") === col("p.id"), "left")
      .withColumn("province_name", col("p.name"))
      .withColumn("province_area_code", col("p.area_code"))
      .withColumn("province_iso_code", col("p.iso_code"))
      .withColumn("province_3166_2", col("p.iso_3166_2"))
      .drop(col("p.id")).drop(col("p.name")).drop(col("p.area_code"))
      .drop(col("p.iso_code")).drop(col("p.iso_3166_2"))
  }
}
