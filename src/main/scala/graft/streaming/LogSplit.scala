package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The 5-way behavior-log split (reference F1-F3, OdsBaseLogApp.scala:
  * 93-213) as pure DataFrame transforms: one parsed stream → err /
  * start / page / display / action branches. Works identically on batch
  * and streaming DataFrames — the streaming wrapper just applies these
  * to a readStream source and fans out sinks under one foreachBatch
  * (single source read per micro-batch, atomic checkpoint).
  *
  * The reference iterates executor-side per record and routes with
  * if/else; here each branch is a declarative filter+projection, so
  * Catalyst prunes the envelope columns per branch and the five
  * branches share one shuffle-free scan.
  */
object LogSplit {

  /** Parse a `value: string` column of envelope JSON. */
  def parse(raw: DataFrame, valueCol: String = "value"): DataFrame =
    raw.select(from_json(col(valueCol), LogSchema.envelope).as("v"))
      .select("v.*")

  /** Error branch: whole envelope rows carrying an err object
    * (reference OdsBaseLogApp.scala:111-114).
    */
  def errors(parsed: DataFrame): DataFrame =
    parsed.filter(col("err").isNotNull)
      .select(col("common.mid").as("mid"), col("err.error_code"),
        col("err.msg"), col("ts"))

  private val commonCols = Seq(
    col("common.ar").as("province_id"), col("common.ba").as("brand"),
    col("common.ch").as("channel"), col("common.is_new").as("is_new"),
    col("common.md").as("model"), col("common.mid").as("mid"),
    col("common.os").as("os"), col("common.uid").as("user_id"),
    col("common.vc").as("version_code"))

  /** Page branch: flat 16-col page log (reference :116-144). */
  def pages(parsed: DataFrame): DataFrame =
    parsed.filter(col("page").isNotNull && col("err").isNull)
      .select(commonCols ++ Seq(
        col("page.page_id"), col("page.last_page_id"),
        col("page.item").as("page_item"),
        col("page.item_type").as("page_item_type"),
        col("page.during_time"), col("page.source_type"),
        col("ts")): _*)

  /** Display branch: one row per exposure element (reference :147-165). */
  def displays(parsed: DataFrame): DataFrame =
    parsed.filter(col("page").isNotNull && col("err").isNull &&
        col("displays").isNotNull)
      .select(commonCols ++ Seq(
        col("page.page_id"), col("ts"),
        explode(col("displays")).as("d")): _*)
      .select(col("*"), col("d.display_type"),
        col("d.item").as("display_item"),
        col("d.item_type").as("display_item_type"),
        col("d.order").as("display_order"), col("d.pos_id"))
      .drop("d")

  /** Action branch: one row per action element, keeping the per-action
    * ts (reference :167-183).
    */
  def actions(parsed: DataFrame): DataFrame =
    parsed.filter(col("page").isNotNull && col("err").isNull &&
        col("actions").isNotNull)
      .select(commonCols ++ Seq(
        col("page.page_id"), explode(col("actions")).as("a")): _*)
      .select(col("*"), col("a.action_id"),
        col("a.item").as("action_item"),
        col("a.item_type").as("action_item_type"),
        col("a.ts").as("action_ts"))
      .drop("a")

  /** Start branch (reference :186-201). */
  def starts(parsed: DataFrame): DataFrame =
    parsed.filter(col("start").isNotNull && col("err").isNull)
      .select(commonCols ++ Seq(
        col("start.entry"), col("start.loading_time"),
        col("start.open_ad_id"), col("start.open_ad_ms"),
        col("start.open_ad_skip_ms"), col("ts")): _*)

  /** All five branches, keyed by their DWD topic names (reference
    * MyConfig topic constants).
    */
  def split(parsed: DataFrame): Map[String, DataFrame] = Map(
    "DWD_ERROR_LOG_TOPIC" -> errors(parsed),
    "DWD_PAGE_LOG_TOPIC" -> pages(parsed),
    "DWD_PAGE_DISPLAY_TOPIC" -> displays(parsed),
    "DWD_PAGE_ACTION_TOPIC" -> actions(parsed),
    "DWD_START_LOG_TOPIC" -> starts(parsed))
}
