package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  // (key, ts, ord) — ord unique and monotone in ts inside each key
  private def ev(rows: (String, Long, Long)*) =
    rows.toDF("k", "ts", "ord")

  test("sessionize: first event starts session 1; gap > gapNs splits") {
    val out = Temporal.sessionize(
      ev(("u", 0L, 1L), ("u", 50L, 2L), ("u", 151L, 3L), ("u", 200L, 4L),
        ("v", 1000L, 5L)),
      "k", "ts", "ord", gapNs = 100L)
      .select($"ord", $"session_seq").as[(Long, Int)].collect().toMap
    // 50-0=50 <= 100 same; 151-50=101 > 100 new; 200-151=49 same
    assert(out === Map(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 2, 5L -> 1))
  }

  test("sessionize: gap exactly equal to gapNs does NOT split") {
    val out = Temporal.sessionize(
      ev(("u", 0L, 1L), ("u", 100L, 2L)), "k", "ts", "ord", gapNs = 100L)
      .select($"ord", $"session_seq").as[(Long, Int)].collect().toMap
    assert(out === Map(1L -> 1, 2L -> 1))
  }

  test("sessionStats: counts, bounds and duration per session") {
    val sess = Temporal.sessionize(
      ev(("u", 0L, 1L), ("u", 50L, 2L), ("u", 500L, 3L)),
      "k", "ts", "ord", gapNs = 100L)
    val stats = Temporal.sessionStats(sess, "k", "ts", "ord")
      .orderBy($"session_seq")
      .select($"session_seq", $"n_events", $"first_ord", $"start_ts",
        $"end_ts", $"duration")
      .collect()
    assert(stats === Array(Row(1, 2L, 1L, 0L, 50L, 50L),
      Row(2, 1L, 3L, 500L, 500L, 0L)))
  }

  private def asof(left: Seq[(String, Long, Long)],
                   right: Seq[(String, Long, Long)]) =
    Temporal.asofJoin(
      left.toDF("k", "ts", "lid"),
      right.toDF("k", "ts", "rid")
        .withColumn("rts", $"ts"),
      "k", "ts", rightOrd = "rid", payload = Seq("rid", "rts"))
      .select($"lid", $"rid", $"rts")

  test("asofJoin: picks the latest right row at-or-before each left ts") {
    val out = asof(
      left = Seq(("u", 100L, 1L), ("u", 250L, 2L)),
      right = Seq(("u", 50L, 10L), ("u", 99L, 11L), ("u", 200L, 12L),
        ("u", 300L, 13L)))
      .as[(Long, Option[Long], Option[Long])].collect()
      .map { case (k, v1, v2) => k -> ((v1, v2)) }.toMap
    assert(out(1L) === ((Some(11L), Some(99L))))
    assert(out(2L) === ((Some(12L), Some(200L))))
  }

  test("asofJoin: same-ts right row is visible; max ord wins ties") {
    val out = asof(
      left = Seq(("u", 100L, 1L)),
      right = Seq(("u", 100L, 10L), ("u", 100L, 11L), ("u", 60L, 12L)))
      .as[(Long, Option[Long], Option[Long])].collect()
    // both ts=100 rows are <= left ts; the greater rid (11) wins
    assert(out === Array((1L, Some(11L), Some(100L))))
  }

  test("asofJoin: no earlier right row -> null payload; key isolation") {
    val out = asof(
      left = Seq(("u", 10L, 1L), ("w", 500L, 2L)),
      right = Seq(("u", 50L, 10L), ("v", 1L, 11L)))
      .as[(Long, Option[Long], Option[Long])].collect()
      .map { case (k, v1, v2) => k -> ((v1, v2)) }.toMap
    assert(out(1L) === ((None, None))) // right row is later
    assert(out(2L) === ((None, None))) // right rows are other keys
  }

  test("asofJoin: left columns pass through unchanged") {
    val left = Seq(("u", 100L, 1L)).toDF("k", "ts", "lid")
      .withColumn("extra", lit("keep"))
    val right = Seq(("u", 50L, 10L)).toDF("k", "ts", "rid")
    val out = Temporal.asofJoin(left, right, "k", "ts", "rid", Seq("rid"))
    assert(out.columns.toSeq === Seq("k", "ts", "lid", "extra", "rid"))
    assert(out.select($"extra").as[String].collect() === Array("keep"))
  }

  test("asofJoin: rejects payload/left column collisions") {
    val l = Seq(("u", 1L, 1L)).toDF("k", "ts", "lid")
    val r = Seq(("u", 1L, 2L)).toDF("k", "ts", "lid")
    intercept[IllegalArgumentException] {
      Temporal.asofJoin(l, r, "k", "ts", "lid", Seq("lid"))
    }
  }

  // (key, ord, ts, state)
  private def cdc(rows: (String, Long, Long, String)*) =
    rows.toDF("k", "ord", "ts", "state")

  test("scd2: collapses repeats, intervals chain, last version open") {
    val out = Temporal.scd2(
      cdc(("u", 1L, 10L, "a"), ("u", 2L, 20L, "a"), ("u", 3L, 30L, "b"),
        ("u", 4L, 40L, "a"), ("v", 5L, 50L, "x")),
      "k", "ord", "ts", Seq("state"))
      .orderBy($"k", $"version")
      .as[(String, String, Long, Option[Long], Int, Boolean)].collect()
    assert(out === Array(
      ("u", "a", 10L, Some(30L), 1, false), // ord2 repeat collapsed
      ("u", "b", 30L, Some(40L), 2, false),
      ("u", "a", 40L, None, 3, true), // a again later = NEW version
      ("v", "x", 50L, None, 1, true)))
  }

  test("scd2: null attributes compare null-safely") {
    val rows = Seq[(String, Long, Long, String)](
      ("u", 1L, 10L, null), ("u", 2L, 20L, null), ("u", 3L, 30L, "a"))
      .toDF("k", "ord", "ts", "state")
    val out = Temporal.scd2(rows, "k", "ord", "ts", Seq("state"))
      .orderBy($"version")
      .as[(String, Option[String], Long, Option[Long], Int, Boolean)]
      .collect()
    assert(out === Array(
      ("u", None, 10L, Some(30L), 1, false), // null==null: collapsed
      ("u", Some("a"), 30L, None, 2, true)))
  }

  test("scd2: versions and intervals are per-key independent") {
    val out = Temporal.scd2(
      cdc(("a", 1L, 1L, "x"), ("b", 2L, 2L, "y")),
      "k", "ord", "ts", Seq("state"))
    assert(out.filter($"version" === 1).count() === 2)
    assert(out.filter($"is_current").count() === 2)
  }

  test("asofJoinForward: earliest following row, ties to smallest ord") {
    val left = Seq(("u", 100L, 1L), ("u", 250L, 2L), ("u", 400L, 3L))
      .toDF("k", "ts", "lid")
    val right = Seq(("u", 100L, 11L), ("u", 100L, 12L), ("u", 300L, 13L))
      .toDF("k", "ts", "rid").withColumn("rts", $"ts")
    val out = Temporal.asofJoinForward(left, right, "k", "ts",
        rightOrd = "rid", payload = Seq("rid", "rts"))
      .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
    assert(out === Map(
      1L -> Some(11L), // same-ts visible; SMALLEST rid wins the tie
      2L -> Some(13L), // next following
      3L -> None))     // nothing after
  }

  test("asofJoinForward mirrors asofJoin under time reversal") {
    val left = Seq(("u", 10L, 1L), ("u", 20L, 2L), ("v", 5L, 3L))
      .toDF("k", "ts", "lid")
    val right = Seq(("u", 12L, 21L), ("u", 19L, 22L), ("v", 9L, 23L))
      .toDF("k", "ts", "rid").withColumn("rts", $"ts")
    val fwd = Temporal.asofJoinForward(left, right, "k", "ts", "rid",
        Seq("rid")).select($"lid", $"rid")
      .as[(Long, Option[Long])].collect().toMap
    // reverse time on both sides; backward asof must agree
    def neg(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", -$"ts")
    val bwdOnNeg = Temporal.asofJoin(neg(left),
        neg(right).withColumn("rid", -$"rid"), "k", "ts", "rid",
        Seq("rid"))
      .select($"lid", (-$"rid").as("rid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(fwd === bwdOnNeg)
  }

  test("intervalJoin: facts pick the covering version, boundaries [from,to)") {
    val dim = Temporal.scd2(
      cdc(("u", 1L, 10L, "a"), ("u", 2L, 30L, "b")),
      "k", "ord", "ts", Seq("state"))
    val facts = Seq(("u", 5L, 100L), ("u", 10L, 101L), ("u", 29L, 102L),
      ("u", 30L, 103L), ("u", 99L, 104L), ("w", 50L, 105L))
      .toDF("k", "ts", "fid")
    val out = Temporal.intervalJoin(facts, dim, "k", "ts", Seq("state"))
      .select($"fid", $"state").as[(Long, Option[String])].collect().toMap
    assert(out === Map(
      100L -> None,       // before first version
      101L -> Some("a"),  // boundary inclusive at valid_from
      102L -> Some("a"),
      103L -> Some("b"),  // valid_to exclusive: 30 belongs to "b"
      104L -> Some("b"),  // open current version
      105L -> None))      // unknown key
  }

  test("intervalJoin: output is exactly one row per fact") {
    val dim = Temporal.scd2(
      cdc(("u", 1L, 10L, "a"), ("u", 2L, 20L, "b"), ("u", 3L, 30L, "c")),
      "k", "ord", "ts", Seq("state"))
    val facts = (0L until 50L).map(i => ("u", i, i)).toDF("k", "ts", "fid")
    val out = Temporal.intervalJoin(facts, dim, "k", "ts", Seq("state"))
    assert(out.count() === 50L)
    assert(out.columns.toSeq === Seq("k", "ts", "fid", "state"))
  }

  test("funnel: steps must complete in order; a miss nulls the tail") {
    val events = Seq(
      // g1: view(10) → click(20) → purchase(30): full funnel
      ("u", 1, 10L, "view"), ("u", 1, 20L, "click"),
      ("u", 1, 30L, "purchase"),
      // g2: click BEFORE the first view never counts; purchase
      // without a qualifying click is unreachable
      ("u", 2, 10L, "click"), ("u", 2, 20L, "view"),
      ("u", 2, 30L, "purchase"),
      // g3: same-ts click qualifies (at-or-after), purchase missing
      ("v", 1, 10L, "view"), ("v", 1, 10L, "click")
    ).toDF("k", "sess", "ts", "et")
    val out = Temporal.funnel(events, Seq("k", "sess"), "ts", "et",
        Seq("view", "click", "purchase"))
      .orderBy($"k", $"sess")
      .select($"k", $"sess", $"step1_ts", $"step2_ts", $"step3_ts",
        $"n_steps_reached")
      .collect()
    assert(out(0) === Row("u", 1, 10L, 20L, 30L, 3))
    assert(out(1) === Row("u", 2, 20L, null, null, 1))
    assert(out(2) === Row("v", 1, 10L, 10L, null, 2))
  }

  test("retention: cohort by first date, distinct users per offset") {
    val d0 = java.sql.Date.valueOf("2026-01-01")
    val d1 = java.sql.Date.valueOf("2026-01-02")
    val d2 = java.sql.Date.valueOf("2026-01-03")
    val events = Seq(
      (1L, d0), (1L, d0), (1L, d2),   // cohort d0, offsets {0, 2}
      (2L, d0), (2L, d1),             // cohort d0, offsets {0, 1}
      (3L, d1)                        // cohort d1, offset {0}
    ).toDF("uid", "dt")
    val out = Temporal.retention(events, "uid", "dt")
      .orderBy($"cohort_dt", $"day_offset")
      .select($"cohort_dt", $"day_offset", $"n_users")
      .collect()
    assert(out === Array(
      Row(d0, 0, 2L), Row(d0, 1, 1L), Row(d0, 2, 1L), Row(d1, 0, 1L)))
  }

  test("holdoutReport: cutoff = max - holdoutDays, eval inclusive, " +
      "overlap counts entities in both splits") {
    def d(s: String) = java.sql.Date.valueOf(s)
    // max = 01-10, holdout 3 -> cutoff 01-07; eval is dt >= 01-07
    val ev = Seq(
      (1L, d("2026-01-01")), (1L, d("2026-01-07")), // user 1: both
      (2L, d("2026-01-02")),                        // train only
      (3L, d("2026-01-10"))                         // eval only
    ).toDF("user_id", "dt")
    val got = Temporal.holdoutReport(ev, "user_id", "dt", 3)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      "train" -> ((2L, 2L)),   // u1@01-01, u2@01-02
      "eval" -> ((2L, 2L)),    // u1@01-07, u3@01-10
      "overlap" -> ((0L, 1L)))) // only u1 leaks across
  }

  test("holdoutReport: TIMESTAMP dtCol works, cut at the calendar date") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // same shape as above but through timestamps with time-of-day:
    // max DATE = 01-10, cutoff 01-07; 01-07 23:59 is still eval
    val ev = Seq(
      (1L, t("2026-01-01 08:00:00")), (1L, t("2026-01-07 23:59:59")),
      (2L, t("2026-01-02 12:30:00")),
      (3L, t("2026-01-10 00:00:01"))
    ).toDF("user_id", "ts")
    val got = Temporal.holdoutReport(ev, "user_id", "ts", 3)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      "train" -> ((2L, 2L)),
      "eval" -> ((2L, 2L)),
      "overlap" -> ((0L, 1L))))
  }
}
