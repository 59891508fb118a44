package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pipeline observability (reference K4: the per-batch debug
  * `rdd.count()` prints, DwdDauApp.scala:71-74,82-85 — which forced a
  * second job per batch). `observe` attaches named metrics to the
  * existing job: zero extra passes, surfaced through
  * `StreamingQueryProgress.observedMetrics` (streaming) or
  * `QueryExecutionListener` (batch).
  */
object Metrics {

  /** Attach row count + null-key count for `keyCol` under `name`. */
  def observeRows(df: DataFrame, name: String, keyCol: String): DataFrame =
    df.observe(name,
      count(lit(1)).as("rows"),
      count(when(col(keyCol).isNull, 1)).as("null_keys"))
}
