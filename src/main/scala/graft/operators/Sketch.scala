package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{Column, DataFrame}

/** Mergeable distinct-count sketches (HyperLogLog, Flajolet et al. 2007).
  *
  * Exact `count(distinct x)` over 100 TB forces a full shuffle of every
  * distinct value; the HLL register array is a 4096-row-per-group bound
  * that partial-aggregates map-side, merges associatively across shards /
  * days / snapshots, and answers within ~1.6 % (1.04/√4096). This is the
  * canonical "distinct URLs / users / tokens per source" tool at corpus
  * scale — compute per-shard registers once, persist them, and re-merge
  * for any rollup without rescanning the data.
  *
  * Determinism contract (same bar as the rest of the engine): the hash is
  * the first 15 hex chars of md5 (60 bits — oracle-reproducible in
  * DuckDB via `CAST('0x'||substr(md5(x),1,15) AS BIGINT)`), the register
  * harmonic sum is an EXACT integer (`Σ 2^(49−reg)` ≤ 4096·2⁴⁹ < 2⁶³ —
  * no float-order sensitivity), and the final estimate applies the
  * published α·m²/Z formula with the linear-counting small-range branch
  * as literal IEEE double arithmetic, floored to BIGINT. Identical
  * expression text on the oracle side yields bit-identical results.
  *
  * Scale shape: one shuffle keyed by (group, bucket) with map-side max
  * partial-agg (≤ 4096 rows per group cross the wire per task), then one
  * tiny (group)-keyed agg over ≤ 4096 rows/group. Register maxing is
  * idempotent and associative, so duplicates and re-merges are free.
  *
  * Reference context: the reference's per-day "distinct mid" need
  * (sparkStreaming_realtime_project DauApp de-dup) is exact at its
  * scale; this is the approximate counterpart a 1000-executor corpus
  * profile needs.
  */
object Sketch {

  /** log2(m): 4096 registers → standard error 1.04/√4096 ≈ 1.6 %. */
  val P = 12
  val NumRegisters = 4096
  private val WBits = 60 - P // 48 suffix bits ranked for leading zeros
  private val WMask = (1L << WBits) - 1 // 281474976710655
  private val MaxRank = WBits + 1 // 49: all-zero suffix

  /** 60-bit md5-prefix hash — positive Long, DuckDB-reproducible. */
  private def hash60(v: Column): Column =
    conv(substring(md5(v), 1, 15), 16, 10).cast(LongType)

  /** HLL registers for the distinct values of `value` within each group:
    * one row per (group, bucket) with `reg` = max rank observed. Empty
    * buckets are implicit (reg 0) — [[hllEstimate]] accounts for them,
    * so a persisted sketch is at most 4096 rows per group.
    */
  def hllRegisters(df: DataFrame, value: Column,
                   groupCols: Seq[String]): DataFrame = {
    val h = hash60(value)
    val w = h.bitwiseAND(lit(WMask))
    val rank = when(w === 0L, lit(MaxRank))
      .otherwise(lit(MaxRank) - length(bin(w)))
    df.select(groupCols.map(col) ++ Seq(
        shiftright(h, WBits).as("bucket"), rank.as("rank")): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("rank")).as("reg"))
  }

  /** Merge register sets (max per bucket) — the cross-shard / cross-day
    * rollup path. Input: union of [[hllRegisters]] outputs that may
    * carry extra partition columns dropped by `groupCols`.
    */
  def hllMerge(registers: DataFrame, groupCols: Seq[String]): DataFrame =
    registers
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("reg")).as("reg"))

  /** Cardinality estimate from a register set: `approx_distinct` BIGINT
    * per group. α·m²/Z with linear counting below 2.5·m (Flajolet 2007);
    * the 60-bit hash space makes the large-range correction moot.
    */
  def hllEstimate(registers: DataFrame,
                  groupCols: Seq[String]): DataFrame = {
    val twoPowMax = lit(1L << MaxRank) // 2^49 per empty bucket
    val agg = registers
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("present"),
           sum(expr(s"shiftleft(CAST(1 AS BIGINT), $MaxRank - reg)"))
             .as("zp"))
    // Exact-integer harmonic denominator; literal IEEE double formula
    // from here (matches the oracle text op for op).
    val zScaled = (col("zp") +
      (lit(NumRegisters.toLong) - col("present")) * twoPowMax)
      .cast("double")
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(4096.0))
    val raw = alpha * lit(4096.0) * lit(4096.0) *
      lit((1L << MaxRank).toDouble) / zScaled
    val v = lit(NumRegisters.toLong) - col("present")
    val est = when(raw <= lit(2.5 * NumRegisters) && v > 0L,
        lit(NumRegisters.toDouble) * log(lit(NumRegisters.toDouble) /
          v.cast("double")))
      .otherwise(raw)
    agg.select(groupCols.map(col) :+
      floor(est).cast(LongType).as("approx_distinct"): _*)
  }

  /** One-shot per-group approximate distinct count of `value`. */
  def hllDistinct(df: DataFrame, value: Column,
                  groupCols: Seq[String]): DataFrame =
    hllEstimate(hllRegisters(df, value, groupCols), groupCols)
}
