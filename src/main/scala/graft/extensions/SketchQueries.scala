package graft.extensions

import org.apache.spark.sql.functions._
import graft.Q
import graft.operators.Sketch
import graft.tables.Tables.documents

/** Driver-checked queries for the mergeable HyperLogLog sketch
  * ([[graft.operators.Sketch]]): per-source approximate distinct token
  * counts, and the same estimate computed via per-shard sketches merged
  * after the fact — the persist-then-rollup path a 100 TB corpus
  * profile uses. Both are full-hash-gated against a DuckDB oracle that
  * mirrors the register algebra exactly (integer harmonic sum, literal
  * IEEE estimate formula).
  */
private[graft] object SketchQueries {
  import OracleSql.TOKS

  /** Direct single-pass HLL oracle per source — also the oracle for the
    * merged variant (merge-invariance is exactly what the sketch
    * guarantees, so both engines must land on identical registers).
    */
  private val hllSql: String = {
    val m = Sketch.NumRegisters // 4096
    val wMask = (1L << 48) - 1
    val twoPow49 = 1L << 49
    s"""WITH tok AS (
       |  SELECT source, unnest($TOKS) AS t FROM documents),
       |h AS (SELECT source,
       |    CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) AS h60
       |  FROM tok WHERE t <> ''),
       |b AS (SELECT source, h60 >> 48 AS bucket,
       |    CASE WHEN (h60 & $wMask) = 0 THEN 49
       |         ELSE 49 - length(bin(h60 & $wMask)) END AS rank
       |  FROM h),
       |reg AS (SELECT source, bucket, max(rank) AS reg
       |  FROM b GROUP BY 1, 2),
       |agg AS (SELECT source, count(*) AS present,
       |    CAST(sum(1::BIGINT << (49 - reg)) AS BIGINT) AS zp
       |  FROM reg GROUP BY 1),
       |est AS (SELECT source,
       |    (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0
       |      * ${twoPow49.toDouble}
       |      / CAST(zp + ($m - present) * $twoPow49 AS DOUBLE) AS raw,
       |    $m - present AS v
       |  FROM agg)
       |SELECT source,
       |  CAST(floor(CASE WHEN raw <= ${2.5 * m} AND v > 0
       |    THEN 4096.0 * ln(4096.0 / CAST(v AS DOUBLE))
       |    ELSE raw END) AS BIGINT) AS approx_distinct
       |FROM est ORDER BY source""".stripMargin
  }

  private def tokensBySource(s: org.apache.spark.sql.SparkSession,
                             d: String) =
    documents(s, d)
      .select(col("source"), col("doc_id"),
        explode(graft.functions.TextFns.toks(col("text"))).as("t"))
      .filter(col("t") =!= "")

  val all: Seq[Q] = Seq(

    Q("ext_hll_distinct", hllSql) { (s, d) =>
      Sketch.hllDistinct(tokensBySource(s, d), col("t"), Seq("source"))
        .orderBy(col("source"))
    },

    // Same estimate via the mergeable path: sketch each synthetic shard
    // (doc_id % 8 stands in for a file/day partition) independently,
    // max-merge the registers, then estimate. Hash-equality with the
    // single-pass oracle PROVES merge invariance cross-engine.
    Q("ext_hll_merge", hllSql) { (s, d) =>
      val sharded = tokensBySource(s, d)
        .withColumn("shard", pmod(col("doc_id"), lit(8)))
      val perShard =
        Sketch.hllRegisters(sharded, col("t"), Seq("source", "shard"))
      val merged = Sketch.hllMerge(perShard, Seq("source"))
      Sketch.hllEstimate(merged, Seq("source")).orderBy(col("source"))
    })
}
