package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Chat

/** Streaming conversation assembly — the ingest-time half of
  * [[graft.operators.Chat.renderConversations]]: turn events roll up
  * into rendered training examples as they arrive, one row per
  * conversation emitted once an inactivity gap closes it (native
  * `session_window` state, like [[StreamingSessionize]]).
  *
  * Batch/stream identity: the rendered `text` of a closed conversation
  * is bit-identical to `Chat.renderConversations` over the same turn
  * rows — the fold runs on the idx-sorted collected array, so
  * micro-batch arrival order and cross-batch merging cannot reorder
  * turns (`StreamingChatSpec` pins the parity).
  *
  * Scale shape: per-conversation state is the collected turn array —
  * conversations are KB-sized — and the watermark evicts each group
  * once closed; append mode means every conversation emits exactly
  * once, so replays are idempotent by the checkpoint contract.
  */
object StreamingChat {

  /** One row per CLOSED conversation: `(convCol, window_start,
    * window_end, n_turns, text)`. `tsCol` must be a timestamp column;
    * `gap` is the inactivity interval that ends a conversation.
    */
  def conversations(turns: DataFrame, convCol: String, idxCol: String,
                    roleCol: String, textCol: String, tsCol: String,
                    gap: String, lateness: String = "1 hour"): DataFrame =
    turns
      .withWatermark(tsCol, lateness)
      .groupBy(col(convCol), session_window(col(tsCol), gap))
      .agg(
        count(lit(1)).cast("int").as("n_turns"),
        aggregate(
          array_sort(collect_list(struct(col(idxCol).as("i"),
            Chat.renderedTurn(col(roleCol), col(textCol)).as("r")))),
          lit(""), (acc, x) => concat(acc, x.getField("r"))).as("text"))
      .select(col(convCol),
        col("session_window.start").as("window_start"),
        col("session_window.end").as("window_end"),
        col("n_turns"), col("text"))
}
