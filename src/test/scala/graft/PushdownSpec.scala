package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec

/** Mechanical scan-shape assertions — the two properties the 100 TB
  * story depends on at the read edge, checked on real registry plans
  * instead of by eyeball:
  *
  *  - PREDICATE PUSHDOWN: day-range filters must reach the parquet
  *    scan as `PushedFilters` (the reason `events` reads raw
  *    epoch-nanos and compares against nanos literals — a cast or
  *    timestamp conversion above the scan would silently disable
  *    row-group skipping on a year of data);
  *  - COLUMN PRUNING: a query projecting 2 of a table's columns must
  *    scan exactly those 2 (`ReadSchema`), not the full row.
  *
  * PlanLintSpec guards shuffle-shape regressions on every registry
  * query; this suite guards the scan shape on representative ones.
  */
class PushdownSpec extends SparkSpec {

  private def scans(df: DataFrame, table: String): Seq[FileSourceScanExec] =
    df.queryExecution.sparkPlan
      .collect { case s: FileSourceScanExec => s }
      .filter(_.metadata.get("Location").exists(_.contains(table)))

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf0001)

  test("event day-range predicates push down to the parquet scan") {
    val es = scans(q("a1_dau_total"), "events")
    assert(es.nonEmpty, "no events scan found")
    es.foreach { s =>
      val pushed = s.metadata.getOrElse("PushedFilters", "[]")
      assert(pushed.contains("ts"),
        s"day-range filter not pushed: ${s.metadata}")
      assert(pushed != "[]")
    }
  }

  test("a1_dau_total reads only (ts, user_id) from the 6-column events") {
    val es = scans(q("a1_dau_total"), "events")
    assert(es.nonEmpty)
    es.foreach { s =>
      assert(s.requiredSchema.fieldNames.toSet == Set("ts", "user_id"),
        s"over-read: ${s.requiredSchema.fieldNames.mkString(",")}")
    }
  }

  test("ext_quality reads only (doc_id, text) from the 5-column documents") {
    val ds = scans(q("ext_quality"), "documents")
    assert(ds.nonEmpty, "no documents scan found")
    ds.foreach { s =>
      assert(s.requiredSchema.fieldNames.toSet == Set("doc_id", "text"),
        s"over-read: ${s.requiredSchema.fieldNames.mkString(",")}")
    }
  }

  test("bucketed minhash index joins without shuffling the index side") {
    // The incremental-dedup contract at 100 TB: the persisted index is
    // STORED bucketed by band, so the per-batch band join shuffles only
    // the (small) batch side — proven here by plan shape, not prose:
    // same join against the same data re-read WITHOUT bucket metadata
    // costs exactly one more ShuffleExchange (the index side).
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import spark.implicits._
    val old = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs tonight"))
      .toDF("doc_id", "text")
    val batch = Seq((10L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_bidx")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    // AQE off so executedPlan exposes the prepared exchanges; broadcast
    // off so the tiny fixture takes the same sort-merge path a real
    // index would
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.operators.Dedup.minhashIndex(old, "doc_id", "text",
          n = 3, k = 24, bands = 6)
        .write.mode("overwrite").bucketBy(4, "band")
        .option("path", dir.resolve("idx").toString)
        .saveAsTable("graft_bucketed_index_test")
      val bucketed = spark.table("graft_bucketed_index_test")
      val plain = spark.read.parquet(dir.resolve("idx").toString)
      def pairs(ix: DataFrame): DataFrame =
        graft.operators.Dedup.incrementalMinhashPairs(batch, "doc_id",
          "text", ix, n = 3, k = 24, bands = 6, threshold = 0.5)
      def exchanges(df: DataFrame): Int =
        df.queryExecution.executedPlan
          .collect { case _: ShuffleExchangeExec => 1 }.sum
      // identical results either way…
      val got = pairs(bucketed).as[(Long, Long, Double)].collect().toSet
      assert(got == pairs(plain).as[(Long, Long, Double)].collect().toSet)
      assert(got.map(p => (p._1, p._2)) == Set((10L, 1L)))
      // …but the bucketed plan saves exactly the index-side exchange
      assert(exchanges(pairs(bucketed)) == exchanges(pairs(plain)) - 1)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_index_test")
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    }
  }

  test("relevance scoring reads only (p_partkey, p_name) from part") {
    // the registry query's final plan hides its scans behind the
    // pagination core's (lazy) localCheckpoint barrier, so assert on
    // the pre-pagination scoring frame — the part the scan shape
    // belongs to. Both the row side and the broadcast stats side scan
    // part; each must prune to the two projected columns.
    val scored = graft.operators.Relevance.scored(
      graft.tables.Tables.part(spark, sf0001)
        .select("p_partkey", "p_name"),
      "p_name", "small widget")
    val ps = scans(scored, "part")
    assert(ps.nonEmpty, "no part scan found")
    // the broadcast stats branch prunes further (p_name alone); every
    // branch must stay within the projection — never the full row
    ps.foreach { s =>
      assert(s.requiredSchema.fieldNames.toSet
        .subsetOf(Set("p_partkey", "p_name")),
        s"over-read: ${s.requiredSchema.fieldNames.mkString(",")}")
    }
    assert(ps.exists(_.requiredSchema.fieldNames.toSet ==
      Set("p_partkey", "p_name")))
  }
}
