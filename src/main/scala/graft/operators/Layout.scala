package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) interleaving and the
  * range-clustered writer shape built on it.
  *
  * Why an engine needs this at 100 TB: parquet data skipping works off
  * per-file / per-row-group min-max statistics, and a table sorted by
  * ONE column only prunes predicates on that column. Interleaving the
  * bits of two (or more) filter columns into a single sort key keeps
  * rows that are close in EVERY dimension close in the file order, so
  * min-max pruning stays effective for predicates on any interleaved
  * dimension (the Delta/Iceberg OPTIMIZE ZORDER design).
  *
  * The interleave itself is a pure-Column bit expression — statically
  * unrolled per bit, whole-stage-codegen'd, no UDF — and reproducible
  * in plain SQL on any engine (the oracle mirrors it with `>>`/`&`
  * arithmetic).
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative
    * integer columns: bit i of `a` lands at position 2i, bit i of `b`
    * at 2i+1. `bits` ≤ 31 (result fits a signed 64-bit). Inputs are
    * masked to `bits` bits, so out-of-range values wrap rather than
    * corrupt the ordering of in-range ones.
    */
  def zValue2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).map { i =>
      shiftright(al, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(bl, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** Cluster a frame for write-out by the Z-order of two columns:
    * range-partition on the interleaved key (partition boundaries from
    * a reservoir sample, so output files hold disjoint z-ranges) and
    * sort within each partition. A parquet write of the result gives
    * every file a tight min-max envelope on BOTH `a` and `b`. The
    * z key rides along as `zCol` for inspection/pruning; drop it
    * after writing if undesired.
    */
  def clusterByZOrder(df: DataFrame, a: Column, b: Column, bits: Int,
                      numPartitions: Int,
                      zCol: String = "z_value"): DataFrame =
    df.withColumn(zCol, zValue2(a, b, bits))
      .repartitionByRange(numPartitions, col(zCol))
      .sortWithinPartitions(col(zCol))
}
