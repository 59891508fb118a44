package graft

import graft.tables.Tables
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Fixture-drift guard. Round 5 lost 31 queries and 64 tests because the
  * driver regenerated `events.parquet` with TIMESTAMP(MICROS) instead of
  * TIMESTAMP(NANOS) and the loader hard-assumed one encoding. This suite
  * pins (a) the dtypes every registry query relies on, table by table,
  * and (b) the loader's behavior against BOTH timestamp encodings via
  * tiny checked-in fixtures — so the next encoding change breaks ONE
  * focused spec with a clear message, not 64 downstream tests.
  */
class TablesSpec extends SparkSpec {

  private def res(sub: String): String =
    getClass.getResource(s"/encodings/$sub").getPath

  // dtypes the queries rely on, per table (events.ts is checked
  // separately — the loader normalizes whatever encoding arrives).
  // A Set means "any of these is fine" — timestamp columns may arrive
  // TZ or NTZ depending on the generator's isAdjustedToUTC flag, and
  // every consumer compares them against to_timestamp/typed literals
  // that Spark coerces for both flavors.
  private val anyTs: Set[DataType] = Set(TimestampType, TimestampNTZType)
  private val expected: Map[String, Map[String, Set[DataType]]] = Map(
    "region"   -> Map("r_regionkey" -> Set(IntegerType),
                      "r_name" -> Set(StringType)),
    "nation"   -> Map("n_nationkey" -> Set(IntegerType),
                      "n_name" -> Set(StringType),
                      "n_regionkey" -> Set(IntegerType)),
    "customer" -> Map("c_custkey" -> Set(LongType),
                      "c_nationkey" -> Set(IntegerType),
                      "c_acctbal" -> Set(DoubleType),
                      "c_mktsegment" -> Set(StringType)),
    "supplier" -> Map("s_suppkey" -> Set(LongType),
                      "s_nationkey" -> Set(IntegerType)),
    "part"     -> Map("p_partkey" -> Set(LongType),
                      "p_name" -> Set(StringType),
                      "p_retailprice" -> Set(DoubleType)),
    "orders"   -> Map("o_orderkey" -> Set(LongType),
                      "o_custkey" -> Set(LongType),
                      "o_totalprice" -> Set(DoubleType),
                      "o_orderstatus" -> Set(StringType),
                      "o_orderdate" -> anyTs),
    "lineitem" -> Map("l_orderkey" -> Set(LongType),
                      "l_partkey" -> Set(LongType),
                      "l_linenumber" -> Set(IntegerType),
                      "l_quantity" -> Set(DoubleType),
                      "l_extendedprice" -> Set(DoubleType),
                      "l_discount" -> Set(DoubleType),
                      "l_tax" -> Set(DoubleType),
                      "l_returnflag" -> Set(StringType),
                      "l_linestatus" -> Set(StringType),
                      "l_shipdate" -> anyTs),
    "events"   -> Map("event_id" -> Set(LongType),
                      "user_id" -> Set(LongType),
                      "event_type" -> Set(StringType),
                      "value" -> Set(DoubleType),
                      "props" -> Set(StringType)),
    "documents" -> Map("doc_id" -> Set(LongType),
                       "text" -> Set(StringType),
                       "lang" -> Set(StringType),
                       "source" -> Set(StringType),
                       "n_chars" -> Set(LongType)),
    "embeddings" -> Map("vec_id" -> Set(LongType),
                        "embedding" -> Set(ArrayType(FloatType)),
                        "label" -> Set(IntegerType))
  )

  test("all 10 sf0.001 tables load with the dtypes the queries rely on") {
    Tables.names.foreach { t =>
      val schema = Tables.load(spark, sf0001, t).schema
      expected(t).foreach { case (c, dts) =>
        assert(schema.fieldNames.contains(c), s"$t: missing column $c")
        assert(dts.contains(schema(c).dataType),
          s"$t.$c: expected one of $dts, fixture now ships " +
            s"${schema(c).dataType} — update the loaders/queries for " +
            "the new encoding")
      }
    }
  }

  test("events.ts arrives as a type the loader can normalize") {
    val dt = Tables.load(spark, sf0001, "events").schema("ts").dataType
    assert(Seq(LongType, TimestampType, TimestampNTZType).contains(dt),
      s"events.ts arrived as $dt — Tables.eventsRaw cannot normalize it; " +
        "add a branch (and a fixture here) for the new encoding")
  }

  // ---- both encodings, same logical rows: fixture day 2024-01-05 has
  // events 1,2,3 inside the day and 4 at the next midnight (exclusive)
  private val day = Tables.dayNanos("2024-01-05")

  for (enc <- Seq("nanos", "micros")) {
    test(s"eventsRaw normalizes the $enc encoding to epoch-nanos Long") {
      val df = Tables.eventsRaw(spark, res(enc))
      assert(df.schema("ts").dataType == LongType)
      val ts = df.orderBy(col("event_id")).select(col("ts"))
        .collect().map(_.getLong(0)).toSeq
      // micros-precision instants, exactly representable in both files
      assert(ts == Seq(1704412800000000000L, 1704412800000001000L,
        1704499199999999000L, 1704499200000000000L),
        s"$enc: normalized nanos mismatch: $ts")
    }

    test(s"eventsRangeNanos filters the $enc encoding correctly") {
      val got = Tables
        .eventsRangeNanos(spark, res(enc), day, day + 86400L * 1000000000L)
        .select(col("event_id")).collect().map(_.getLong(0)).toSet
      assert(got == Set(1L, 2L, 3L), s"$enc: day filter returned $got")
    }

    test(s"eventsRangeNanos pushes the range predicate into the $enc scan") {
      val df = Tables
        .eventsRangeNanos(spark, res(enc), day, day + 86400L * 1000000000L)
      val scans = df.queryExecution.sparkPlan
        .collect { case s: FileSourceScanExec => s }
      assert(scans.nonEmpty)
      scans.foreach { s =>
        val pushed = s.metadata.getOrElse("PushedFilters", "[]")
        assert(pushed.contains("ts") && pushed != "[]",
          s"$enc: range predicate not pushed: ${s.metadata}")
      }
    }
  }

  // ---- content pins: catch a silent regeneration that keeps dtypes ----
  // but changes semantics (the inverse of the r5 failure mode). Hash is
  // order-independent (XOR of per-row xxhash64 over sorted-name JSON)
  // and, for events, computed over the NORMALIZED eventsRaw shape so a
  // pure encoding flip (NANOS↔MICROS) does NOT trip it — only a value
  // change does. Refresh deliberately via graft.tools.PinFixtures.
  private val pins: Map[String, (Long, Long)] = Map(
    "region" -> (5L, -5651503024748686397L),
    "nation" -> (25L, 4321497658629274824L),
    "customer" -> (150L, -1355878662744390252L),
    "supplier" -> (10L, -4733724550227575051L),
    "part" -> (200L, 3312597342002846785L),
    "orders" -> (1500L, -6274678722890197870L),
    "lineitem" -> (6000L, -6791136413875100567L),
    "events" -> (1000L, 3457195247681040869L),
    "documents" -> (500L, -8338897894077822582L),
    "embeddings" -> (500L, 8678858205436700256L))

  test("sf0.001 row counts and content hashes match the checked-in pins") {
    val drifted = Tables.names.flatMap { t =>
      val df =
        if (t == "events") Tables.eventsRaw(spark, sf0001)
        else Tables.load(spark, sf0001, t)
      val got = (df.count(), graft.tools.PinFixtures.tableHash(df))
      if (got == pins(t)) None
      else Some(s"$t: expected ${pins(t)}, got $got")
    }
    assert(drifted.isEmpty,
      "fixture content drift (regenerate pins via graft.tools.PinFixtures " +
        "ONLY if the change is intentional):\n" + drifted.mkString("\n"))
  }
}
