package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-shaping operators over numeric fact columns. */
object Stats {

  /** Per-group winsorization: clip `valCol` into the [`lo`, `hi`]
    * exact quantiles of its own group (outlier remediation before a
    * sum/mean that a single corrupt value would dominate). Emits the
    * input columns plus (p_lo, p_hi, clipped).
    *
    * Two-pass shape: one hash-agg computes the two exact quantiles
    * per group, then an equi-join on `keyCol` attaches them and the
    * clip is a narrow projection. The quantile table has one row per
    * group — Spark's planner broadcasts it when small; at millions of
    * groups the equi-join shuffles both sides by key, which is the
    * right plan anyway. Exact `percentile` keeps the oracle parity
    * (≡ DuckDB `quantile_cont`); swap `percentile_approx` at the same
    * call site when a bounded-memory sketch is preferred at 100 TB.
    */
  def winsorize(df: DataFrame, keyCol: String, valCol: String,
                lo: Double, hi: Double): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi,
      s"need 0 <= lo < hi <= 1, got lo=$lo hi=$hi")
    val q = df.groupBy(col(keyCol))
      .agg(
        percentile(col(valCol), lit(lo)).as("p_lo"),
        percentile(col(valCol), lit(hi)).as("p_hi"))
    df.join(q, keyCol)
      .withColumn("clipped",
        least(greatest(col(valCol), col("p_lo")), col("p_hi")))
  }
}
