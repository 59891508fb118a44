package graft.streaming

import org.apache.spark.sql.types._

/** Canonical schemas for the behavior-log envelope and its five split
  * outputs — the engine's replacement for the reference's fastjson
  * schema-on-read beans (reference: sparkStreaming-realtime/.../bean/
  * PageLog.scala:6-23, PageDisplayLog.scala:3-25, PageActionLog.scala:
  * 6-27, StartLog.scala:6-21; envelope shape OdsBaseLogApp.scala:111-201).
  *
  * One deliberate divergence, per SURVEY §1: the reference's
  * `channer` field-name typo (PageLog.scala:10) is normalized to
  * `channel` — we replicate intended semantics, not bugs.
  */
object LogSchema {

  val common: StructType = StructType(Seq(
    StructField("ar", StringType),   // area/province id
    StructField("ba", StringType),   // brand
    StructField("ch", StringType),   // channel
    StructField("is_new", StringType),
    StructField("md", StringType),   // model
    StructField("mid", StringType),  // device id
    StructField("os", StringType),
    StructField("uid", StringType),  // user id
    StructField("vc", StringType)))  // version code

  val page: StructType = StructType(Seq(
    StructField("during_time", LongType),
    StructField("item", StringType),
    StructField("item_type", StringType),
    StructField("last_page_id", StringType),
    StructField("page_id", StringType),
    StructField("source_type", StringType)))

  val display: StructType = StructType(Seq(
    StructField("display_type", StringType),
    StructField("item", StringType),
    StructField("item_type", StringType),
    StructField("order", LongType),
    StructField("pos_id", LongType)))

  val action: StructType = StructType(Seq(
    StructField("action_id", StringType),
    StructField("item", StringType),
    StructField("item_type", StringType),
    StructField("ts", LongType)))

  val start: StructType = StructType(Seq(
    StructField("entry", StringType),
    StructField("loading_time", LongType),
    StructField("open_ad_id", LongType),
    StructField("open_ad_ms", LongType),
    StructField("open_ad_skip_ms", LongType)))

  val err: StructType = StructType(Seq(
    StructField("error_code", LongType),
    StructField("msg", StringType)))

  /** Full ODS log envelope. */
  val envelope: StructType = StructType(Seq(
    StructField("common", common),
    StructField("page", page),
    StructField("displays", ArrayType(display)),
    StructField("actions", ArrayType(action)),
    StructField("start", start),
    StructField("err", err),
    StructField("ts", LongType)))
}
