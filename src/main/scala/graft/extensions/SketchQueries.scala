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
    },

    // Multi-granularity rollup from ONE register pass: per-(source,
    // shard) sketches persisted once, then max-merged up to (source),
    // (shard) and the grand total — the "profile a 100 TB corpus at
    // every granularity from one scan" path (re-aggregating persisted
    // sketches instead of re-scanning raw data per grouping). The
    // oracle computes each grouping's registers DIRECTLY via GROUPING
    // SETS, so hash equality proves merge-invariance at every level.
    Q("ext_hll_cube", {
      val m = Sketch.NumRegisters
      val wMask = (1L << 48) - 1
      val twoPow49 = 1L << 49
      s"""WITH tok AS (SELECT source, doc_id % 8 AS shard,
         |  unnest($TOKS) AS t FROM documents),
         |h AS (SELECT source, shard,
         |    CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) AS h60
         |  FROM tok WHERE t <> ''),
         |b AS (SELECT source, shard, h60 >> 48 AS bucket,
         |    CASE WHEN (h60 & $wMask) = 0 THEN 49
         |         ELSE 49 - length(bin(h60 & $wMask)) END AS rank
         |  FROM h),
         |reg AS (SELECT coalesce(source, '*') AS source,
         |    coalesce(CAST(shard AS VARCHAR), '*') AS shard,
         |    bucket, max(rank) AS reg
         |  FROM b GROUP BY GROUPING SETS ((source, shard, bucket),
         |    (source, bucket), (shard, bucket), (bucket))),
         |agg AS (SELECT source, shard, count(*) AS present,
         |    CAST(sum(1::BIGINT << (49 - reg)) AS BIGINT) AS zp
         |  FROM reg GROUP BY 1, 2),
         |est AS (SELECT source, shard,
         |    (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0
         |      * ${twoPow49.toDouble}
         |      / CAST(zp + ($m - present) * $twoPow49 AS DOUBLE) AS raw,
         |    $m - present AS v
         |  FROM agg)
         |SELECT source, shard,
         |  CAST(floor(CASE WHEN raw <= ${2.5 * m} AND v > 0
         |    THEN 4096.0 * ln(4096.0 / CAST(v AS DOUBLE))
         |    ELSE raw END) AS BIGINT) AS approx_distinct
         |FROM est ORDER BY source, shard""".stripMargin
    }) { (s, d) =>
      val sharded = tokensBySource(s, d)
        .withColumn("shard", pmod(col("doc_id"), lit(8)))
      val perShard = Sketch.hllRegisters(sharded, col("t"),
          Seq("source", "shard"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def level(keys: Seq[String]) =
        Sketch.hllEstimate(Sketch.hllMerge(perShard, keys), keys)
          .select(
            (if (keys.contains("source")) col("source") else lit("*"))
              .as("source"),
            (if (keys.contains("shard")) col("shard").cast("string")
             else lit("*")).as("shard"),
            col("approx_distinct"))
      level(Seq("source", "shard"))
        .unionAll(level(Seq("source")))
        .unionAll(level(Seq("shard")))
        .unionAll(level(Seq.empty))
        .orderBy(col("source"), col("shard"))
    },

    // Count-min point-frequency estimates for the corpus's top-20
    // tokens (exact-count selection, token tie-break), alongside the
    // exact counts — every value integer, so the gate is a full
    // bit-for-bit hash match of the sketch algebra.
    Q("ext_cms_freq", {
      val (d, w) = (Sketch.CmsDepth, Sketch.CmsWidth)
      def cell(tExpr: String) =
        s"CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || $tExpr)," +
          s" 1, 15) AS BIGINT) % $w"
      s"""WITH tok AS (
         |  SELECT t FROM (SELECT unnest($TOKS) AS t FROM documents)
         |  WHERE t <> ''),
         |cells AS (
         |  SELECT j, ${cell("t")} AS cell, count(*) AS cnt
         |  FROM tok CROSS JOIN range($d) r(j) GROUP BY 1, 2),
         |top AS (
         |  SELECT t AS token, CAST(count(*) AS BIGINT) AS exact_cnt
         |  FROM tok GROUP BY 1 ORDER BY exact_cnt DESC, token LIMIT 20),
         |probe AS (
         |  SELECT token, exact_cnt, j, ${cell("token")} AS cell
         |  FROM top CROSS JOIN range($d) r(j))
         |SELECT p.token, p.exact_cnt,
         |  CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS cms_count
         |FROM probe p LEFT JOIN cells c ON c.j = p.j AND c.cell = p.cell
         |GROUP BY 1, 2 ORDER BY token""".stripMargin
    }) { (s, d) =>
      val toks = tokensBySource(s, d).select("t")
      val sketch = Sketch.cmsSketch(toks, col("t"), Seq.empty)
      val top = toks.groupBy(col("t").as("token"))
        .agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("token"))
        .limit(20)
      Sketch.cmsLookup(sketch, top, "token", Seq.empty)
        .orderBy(col("token"))
    },

    // Per-source p50/p90/p99 of document length from the mergeable
    // decimal-bucket quantile sketch — the third profile sketch. All
    // integer arithmetic ⇒ full bit-for-bit hash gate.
    Q("ext_qsketch",
      s"""WITH b AS (
         |  SELECT source,
         |    CASE WHEN n_chars <= 999 THEN n_chars
         |         ELSE n_chars - (n_chars % CAST(power(10,
         |           length(CAST(n_chars AS VARCHAR)) - 3) AS BIGINT)) END
         |      AS qbucket,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM documents GROUP BY 1, 2),
         |c AS (SELECT source, qbucket, cnt,
         |    CAST(sum(cnt) OVER (PARTITION BY source ORDER BY qbucket)
         |      AS BIGINT) AS cum,
         |    CAST(sum(cnt) OVER (PARTITION BY source) AS BIGINT) AS total
         |  FROM b),
         |p AS (SELECT * FROM c
         |  CROSS JOIN (SELECT unnest([500, 900, 990]) AS permille))
         |SELECT source, permille, min(qbucket) AS q_value
         |FROM p WHERE cum * 1000 >= permille * total
         |GROUP BY 1, 2 ORDER BY source, permille""".stripMargin) { (s, d) =>
      val sk = Sketch.qsketch(documents(s, d), col("n_chars"), Seq("source"))
      Sketch.qsketchQuantiles(sk, Seq("source"), Seq(500, 900, 990))
        .orderBy(col("source"), col("permille"))
    },

    // Approximate DAU — the sketch counterpart of a1/a2's exact DAU
    // (reference DauApp): per-day HLL over user ids through the
    // adaptive events loader. At the reference's real scale the exact
    // per-day distinct state is a full shuffle of every user id; this
    // is ≤ 4096 registers per day, mergeable across ingest shards.
    Q("ext_hll_dau", {
      val m = Sketch.NumRegisters
      val wMask = (1L << 48) - 1
      val twoPow49 = 1L << 49
      s"""WITH u AS (
         |  SELECT strftime(ts, '%Y-%m-%d') AS dt,
         |    CAST(user_id AS VARCHAR) AS uid FROM events),
         |h AS (SELECT dt,
         |    CAST('0x' || substr(md5(uid), 1, 15) AS BIGINT) AS h60
         |  FROM u),
         |reg AS (SELECT dt, h60 >> 48 AS bucket,
         |    max(CASE WHEN (h60 & $wMask) = 0 THEN 49
         |        ELSE 49 - length(bin(h60 & $wMask)) END) AS reg
         |  FROM h GROUP BY 1, 2),
         |agg AS (SELECT dt, count(*) AS present,
         |    CAST(sum(1::BIGINT << (49 - reg)) AS BIGINT) AS zp
         |  FROM reg GROUP BY 1),
         |est AS (SELECT dt,
         |    (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0
         |      * ${twoPow49.toDouble}
         |      / CAST(zp + ($m - present) * $twoPow49 AS DOUBLE) AS raw,
         |    $m - present AS v FROM agg)
         |SELECT dt,
         |  CAST(floor(CASE WHEN raw <= ${2.5 * m} AND v > 0
         |    THEN 4096.0 * ln(4096.0 / CAST(v AS DOUBLE))
         |    ELSE raw END) AS BIGINT) AS approx_dau
         |FROM est ORDER BY dt""".stripMargin
    }) { (s, d) =>
      val ev = graft.tables.Tables.eventsRaw(s, d)
        .select(date_format(expr("timestamp_micros(ts div 1000)"),
            "yyyy-MM-dd").as("dt"),
          col("user_id").cast("string").as("uid"))
      Sketch.hllDistinct(ev, col("uid"), Seq("dt"))
        .withColumnRenamed("approx_distinct", "approx_dau")
        .orderBy(col("dt"))
    },

    // Per-source Shannon token entropy (nats) — corpus diversity;
    // fx-quantized cross-row sum keeps it order-independent and the
    // oracle exact.
    Q("ext_entropy", {
      val fx = OracleSql.fxSql(
        "CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))", "1000000.0")
      s"""WITH tok AS (SELECT source, unnest($TOKS) AS t FROM documents),
         |cnt AS (SELECT source, t, count(*) AS c FROM tok GROUP BY 1, 2),
         |agg AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
         |    $fx AS q
         |  FROM cnt GROUP BY 1)
         |SELECT source, n_tokens,
         |  ln(CAST(n_tokens AS DOUBLE))
         |    - (CAST(q AS DOUBLE) / 1000000.0)
         |      / CAST(n_tokens AS DOUBLE) AS entropy
         |FROM agg ORDER BY source""".stripMargin
    }) { (s, d) =>
      graft.operators.TextAnalysis
        .sourceEntropy(documents(s, d), "source", "text")
        .orderBy(col("source"))
    },

    // Schema-driven table profile of `orders` — DESCRIBE at corpus
    // scale (row/null counts, HLL distinct, binary min/max of a
    // canonical rendering). The oracle melts the same six columns with
    // the same canonicalization, so the gate is a full hash match.
    Q("ext_table_profile", {
      val m = Sketch.NumRegisters
      val wMask = (1L << 48) - 1
      val twoPow49 = 1L << 49
      s"""WITH melted AS (
         |  SELECT 'o_orderkey' AS col_name,
         |    CAST(o_orderkey AS VARCHAR) AS v FROM orders
         |  UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR)
         |    FROM orders
         |  UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
         |  UNION ALL SELECT 'o_totalprice', CAST(CAST(
         |    floor(o_totalprice * 1000 + 0.5) AS BIGINT) AS VARCHAR)
         |    FROM orders
         |  UNION ALL SELECT 'o_orderdate',
         |    strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') FROM orders
         |  UNION ALL SELECT 'o_orderpriority', o_orderpriority
         |    FROM orders),
         |base AS (SELECT col_name, CAST(count(*) AS BIGINT) AS n_rows,
         |    CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_nulls,
         |    min(v) AS min_value, max(v) AS max_value
         |  FROM melted GROUP BY 1),
         |h AS (SELECT col_name,
         |    CAST('0x' || substr(md5(v), 1, 15) AS BIGINT) AS h60
         |  FROM melted WHERE v IS NOT NULL),
         |reg AS (SELECT col_name, h60 >> 48 AS bucket,
         |    max(CASE WHEN (h60 & $wMask) = 0 THEN 49
         |        ELSE 49 - length(bin(h60 & $wMask)) END) AS reg
         |  FROM h GROUP BY 1, 2),
         |agg AS (SELECT col_name, count(*) AS present,
         |    CAST(sum(1::BIGINT << (49 - reg)) AS BIGINT) AS zp
         |  FROM reg GROUP BY 1),
         |est AS (SELECT col_name,
         |    CAST(floor(CASE WHEN raw <= ${2.5 * m} AND vv > 0
         |      THEN 4096.0 * ln(4096.0 / CAST(vv AS DOUBLE)) ELSE raw END)
         |      AS BIGINT) AS approx_distinct
         |  FROM (SELECT col_name,
         |      (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0
         |        * ${twoPow49.toDouble}
         |        / CAST(zp + ($m - present) * $twoPow49 AS DOUBLE) AS raw,
         |      $m - present AS vv FROM agg))
         |SELECT base.col_name, n_rows, n_nulls, min_value, max_value,
         |  COALESCE(approx_distinct, 0) AS approx_distinct
         |FROM base LEFT JOIN est ON est.col_name = base.col_name
         |ORDER BY base.col_name""".stripMargin
    }) { (s, d) =>
      Sketch.tableProfile(graft.tables.Tables.orders(s, d))
        .orderBy(col("col_name"))
    },

    // Approximate cross-source vocabulary overlap by HLL
    // inclusion-exclusion — the sketch twin of ext_source_overlap's
    // exact content matrix: pairs x 4096 registers instead of a
    // distinct-(content, source) self-join over the data. Pairs with
    // zero co-present buckets are omitted (both engines agree; their
    // estimate is <= 0 anyway).
    Q("ext_hll_overlap", {
      val m = Sketch.NumRegisters
      val wMask = (1L << 48) - 1
      val twoPow49 = 1L << 49
      def est(zp: String, p: String) =
        s"CAST(floor(CASE WHEN (0.7213 / (1.0 + 1.079 / 4096.0)) " +
          s"* 4096.0 * 4096.0 * ${twoPow49.toDouble} " +
          s"/ CAST(($zp) + ($m - ($p)) * $twoPow49 AS DOUBLE) " +
          s"<= ${2.5 * m} AND ($m - ($p)) > 0 " +
          s"THEN 4096.0 * ln(4096.0 / CAST($m - ($p) AS DOUBLE)) " +
          s"ELSE (0.7213 / (1.0 + 1.079 / 4096.0)) " +
          s"* 4096.0 * 4096.0 * ${twoPow49.toDouble} " +
          s"/ CAST(($zp) + ($m - ($p)) * $twoPow49 AS DOUBLE) END) " +
          s"AS BIGINT)"
      s"""WITH tok AS (
         |  SELECT source, unnest($TOKS) AS t FROM documents),
         |h AS (SELECT source,
         |    CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) AS h60
         |  FROM tok WHERE t <> ''),
         |reg AS (SELECT source, h60 >> 48 AS bucket,
         |    max(CASE WHEN (h60 & $wMask) = 0 THEN 49
         |        ELSE 49 - length(bin(h60 & $wMask)) END) AS reg
         |  FROM h GROUP BY 1, 2),
         |per AS (SELECT source, count(*) AS present,
         |    CAST(sum(1::BIGINT << (49 - reg)) AS BIGINT) AS zp
         |  FROM reg GROUP BY 1),
         |co AS (SELECT a.source AS source_a, b.source AS source_b,
         |    count(*) AS n_both,
         |    CAST(sum((1::BIGINT << (49 - greatest(a.reg, b.reg)))
         |      - (1::BIGINT << (49 - a.reg))
         |      - (1::BIGINT << (49 - b.reg))) AS BIGINT) AS corr
         |  FROM reg a JOIN reg b
         |    ON a.bucket = b.bucket AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT source_a, source_b,
         |  greatest(0, ${est("pa.zp", "pa.present")}
         |    + ${est("pb.zp", "pb.present")}
         |    - ${est("pa.zp + pb.zp + corr",
                      "pa.present + pb.present - n_both")})
         |    AS approx_overlap
         |FROM co JOIN per pa ON pa.source = source_a
         |        JOIN per pb ON pb.source = source_b
         |ORDER BY source_a, source_b""".stripMargin
    }) { (s, d) =>
      val regs = Sketch.hllRegisters(tokensBySource(s, d), col("t"),
        Seq("source"))
      Sketch.hllOverlap(regs, "source")
        .withColumnRenamed("ga", "source_a")
        .withColumnRenamed("gb", "source_b")
        .orderBy(col("source_a"), col("source_b"))
    },

    // One-stop per-source corpus profile from the sketch trio: doc and
    // char totals, HLL approximate distinct tokens, p50/p99 length.
    // Three bounded aggregates (≤ sources × 4096 rows each) joined on
    // source — at 100 TB every input is a map-side-combining agg over
    // one scan family and the join moves ≤ |sources| rows.
    Q("ext_profile_sketch", {
      val m = Sketch.NumRegisters
      val wMask = (1L << 48) - 1
      val twoPow49 = 1L << 49
      s"""WITH tok AS (
         |  SELECT source, unnest($TOKS) AS t FROM documents),
         |h AS (SELECT source,
         |    CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) AS h60
         |  FROM tok WHERE t <> ''),
         |reg AS (SELECT source, h60 >> 48 AS bucket,
         |    max(CASE WHEN (h60 & $wMask) = 0 THEN 49
         |        ELSE 49 - length(bin(h60 & $wMask)) END) AS reg
         |  FROM h GROUP BY 1, 2),
         |hagg AS (SELECT source, count(*) AS present,
         |    CAST(sum(1::BIGINT << (49 - reg)) AS BIGINT) AS zp
         |  FROM reg GROUP BY 1),
         |hll AS (SELECT source,
         |    CAST(floor(CASE WHEN raw <= ${2.5 * m} AND v > 0
         |      THEN 4096.0 * ln(4096.0 / CAST(v AS DOUBLE)) ELSE raw END)
         |      AS BIGINT) AS approx_distinct_tokens
         |  FROM (SELECT source,
         |      (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0
         |        * ${twoPow49.toDouble}
         |        / CAST(zp + ($m - present) * $twoPow49 AS DOUBLE) AS raw,
         |      $m - present AS v FROM hagg)),
         |qb AS (SELECT source,
         |    CASE WHEN n_chars <= 999 THEN n_chars
         |         ELSE n_chars - (n_chars % CAST(power(10,
         |           length(CAST(n_chars AS VARCHAR)) - 3) AS BIGINT)) END
         |      AS qbucket,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM documents GROUP BY 1, 2),
         |qc AS (SELECT source, qbucket, cnt,
         |    CAST(sum(cnt) OVER (PARTITION BY source ORDER BY qbucket)
         |      AS BIGINT) AS cum,
         |    CAST(sum(cnt) OVER (PARTITION BY source) AS BIGINT) AS total
         |  FROM qb),
         |quant AS (SELECT source,
         |    min(CASE WHEN cum * 1000 >= 500 * total THEN qbucket END)
         |      AS p50_chars,
         |    min(CASE WHEN cum * 1000 >= 990 * total THEN qbucket END)
         |      AS p99_chars
         |  FROM qc GROUP BY 1),
         |base AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(n_chars) AS BIGINT) AS total_chars
         |  FROM documents GROUP BY 1)
         |SELECT base.source, n_docs, total_chars, approx_distinct_tokens,
         |  p50_chars, p99_chars
         |FROM base JOIN hll USING (source) JOIN quant USING (source)
         |ORDER BY source""".stripMargin
    }) { (s, d) =>
      val docs = documents(s, d)
      val hll = Sketch.hllDistinct(tokensBySource(s, d), col("t"),
          Seq("source"))
        .withColumnRenamed("approx_distinct", "approx_distinct_tokens")
      val quant = Sketch.qsketchQuantiles(
          Sketch.qsketch(docs, col("n_chars"), Seq("source")),
          Seq("source"), Seq(500, 990))
        .groupBy("source")
        .agg(min(when(col("permille") === 500, col("q_value")))
               .as("p50_chars"),
             min(when(col("permille") === 990, col("q_value")))
               .as("p99_chars"))
      val base = docs.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
             sum(col("n_chars")).as("total_chars"))
      base.join(hll, Seq("source")).join(quant, Seq("source"))
        .orderBy(col("source"))
    })
}
