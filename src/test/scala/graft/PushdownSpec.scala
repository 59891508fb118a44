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
