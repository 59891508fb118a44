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

  /** AQE off for the duration of `body` so executedPlan exposes the
    * prepared exchanges/aggregates to `collect` (the bucketed test
    * above does the same inline).
    */
  private def withoutAqe[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("bm25Batch never broadcasts or re-shuffles the corpus before " +
      "its map-side top-k partials") { withoutAqe {
    import org.apache.spark.sql.execution.exchange.{
      BroadcastExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.execution.aggregate.{
      HashAggregateExec, ObjectHashAggregateExec}
    val plan = q("ext_bm25_batch").queryExecution.executedPlan
    // a broadcast side touching the documents scan must have been
    // aggregated DOWN first (the term-sized dft frame) — the raw
    // corpus must never broadcast
    plan.collect { case b: BroadcastExchangeExec => b }.foreach { b =>
      val touchesDocs = b.collect { case s: FileSourceScanExec => s }
        .exists(_.metadata.get("Location").exists(_.contains("documents")))
      if (touchesDocs)
        assert(b.collect {
          case a: HashAggregateExec => a
          case a: ObjectHashAggregateExec => a
        }.nonEmpty,
          "raw documents scan broadcast without aggregation")
    }
    // the bounded-heap top-k runs as partial ObjectHashAggregate below
    // ONE exchange keyed by query id — exchanges are bounded by the
    // pipeline's aggregation stages: tf grouping (the one corpus-token
    // shuffle, already filtered to query terms), dft, terms-distinct,
    // per-(query, doc) rollup, top-k, and the final ORDER BY sort
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.size <= 7,
      s"unexpected extra shuffles: ${shuffles.size}")
    assert(plan.collect { case o: ObjectHashAggregateExec => o }.nonEmpty,
      "bounded-heap TopKByScore partials missing from the plan")
  } }

  test("frontierSchedule / tokenQuotaByGroup add exactly ONE shuffle " +
      "for their per-group window") { withoutAqe {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import graft.operators.{Corpus, Web}
    import org.apache.spark.sql.functions._
    val urls = spark.range(64).select(
      concat(lit("https://h"), (col("id") % 8).cast("string"),
        lit(".com/p"), col("id").cast("string")).as("url"),
      lit(1.0).as("delay"))
    val sched = Web.frontierSchedule(urls, "url", "delay", 1.0)
    assert(sched.queryExecution.executedPlan
      .collect { case s: ShuffleExchangeExec => s }.size == 1)
    val docs = spark.range(64).select(col("id"),
      (col("id") % 4).cast("string").as("g"), lit("a b c").as("text"))
    val tq = Corpus.tokenQuotaByGroup(docs, "g", "id", "text", 10L)
    assert(tq.queryExecution.executedPlan
      .collect { case s: ShuffleExchangeExec => s }.size == 1)
  } }
}
