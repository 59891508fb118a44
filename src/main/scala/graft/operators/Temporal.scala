package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators over keyed event streams: gap-based
  * sessionization and the as-of (nearest-prior-event) join.
  *
  * Both are the canonical scalable shapes, not pair joins:
  *
  *  - `sessionize` is ONE shuffle by key + an in-partition sort; the
  *    session boundary is a lag comparison and the session index a
  *    running sum — no self-join, no state larger than a partition's
  *    sort buffer. This is the batch shadow of the reference's
  *    session semantics (a visit starts where `last_page_id` is null,
  *    `DwdDauApp.scala:78-105`) generalized to arbitrary gap rules.
  *  - `asofJoin` is the union-and-carry form: tag both inputs, shuffle
  *    ONCE by key, sort by (ts, side, ord) inside each partition, and
  *    carry the latest right-side payload forward with
  *    `last(ignoreNulls)`. A naive formulation (range self-join +
  *    per-left-row argmax) explodes to O(left x right-per-key) pairs
  *    and reshuffles twice; this form's cost is one sort-merge pass,
  *    which is how it survives a 100 TB event table. The right side's
  *    payload columns ride as one struct so every carried field comes
  *    from the SAME right row by construction.
  *
  * Determinism contract: `ordCol` must be a unique per-row column
  * whose order agrees with `tsCol` inside ties (the driver's
  * `event_id` is monotone in `ts` and unique). All window orderings
  * are total, so results are oracle-hashable.
  */
object Temporal {

  /** Assign a per-key session sequence number: a new session starts at
    * the first event of a key or after a gap of more than `gapNs`
    * since the previous event. Adds `session_seq` (1-based Int).
    *
    * `tsCol` must be a numeric column (epoch-nanos Long here — raw
    * scan representation, so the gap arithmetic is exact integer and
    * the filter above it can still push down).
    */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 ordCol: String, gapNs: Long): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(ordCol))
    val prev = lag(col(tsCol), 1).over(byKey)
    val isStart = when(
      prev.isNull || col(tsCol) - prev > gapNs, 1L).otherwise(0L)
    events
      .withColumn("__start", isStart)
      .withColumn("session_seq",
        sum(col("__start"))
          .over(byKey.rowsBetween(Window.unboundedPreceding,
            Window.currentRow))
          .cast("int"))
      .drop("__start")
  }

  /** Per-session rollup over a sessionized frame: event count, first
    * ord, session start/end timestamps and duration — exact integers
    * in `tsCol`'s unit (column names are unit-neutral; the µs-based
    * registry queries alias them `*_us`).
    */
  def sessionStats(sessionized: DataFrame, keyCol: String, tsCol: String,
                   ordCol: String): DataFrame =
    sessionized
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(ordCol)).as("first_ord"),
        min(col(tsCol)).as("start_ts"),
        max(col(tsCol)).as("end_ts"),
        (max(col(tsCol)) - min(col(tsCol))).as("duration"))

  /** Type-2 slowly-changing-dimension history from an ordered change
    * stream: collapse consecutive rows whose `attrCols` are unchanged,
    * then interval-ize — each surviving change row becomes a version
    * valid from its own `tsCol` until the next change's `tsCol`
    * (exclusive; NULL for the open current version). Emits
    * (key, attrs*, valid_from, valid_to, version, is_current), version
    * 1-based per key in `ordCol` order.
    *
    * This is the dim-history generalization of the reference's
    * latest-only Redis dim store (`DimApp`/`MyRedisUtils` keep only
    * the newest row per pk; SCD2 keeps the full auditable timeline) —
    * the shape a training-data pipeline needs to join facts to the
    * dim value AS OF the fact's event time (feed [[asofJoin]] with
    * the change rows, or range-join the intervals).
    *
    * Scale shape: ONE shuffle by `keyCol`; both windows (the lag
    * change-detect and the lead/rank interval pass) sort in-partition
    * on the same key set, so the second window reuses the first's
    * exchange. No self-join, no state beyond a partition sort buffer.
    * Null-safe change detection via a struct `<=>` comparison.
    */
  def scd2(cdc: DataFrame, keyCol: String, ordCol: String, tsCol: String,
           attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "scd2 needs at least one attribute column")
    // withColumn REPLACES an existing column of the same name — a CDC
    // frame already carrying e.g. valid_from would be silently
    // corrupted (same reserved-name contract as intervalJoin)
    val reserved = cdc.columns.toSet.intersect(
      Set("valid_from", "valid_to", "version", "is_current", "__chg"))
    require(reserved.isEmpty,
      s"input columns collide with scd2's output columns: $reserved")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(ordCol))
    val attrs = struct(attrCols.map(col): _*)
    val changed = !(attrs <=> lag(attrs, 1).over(w))
    cdc
      .withColumn("__chg", changed)
      .filter(col("__chg"))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w).cast("int"))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol) +: attrCols.map(col) :+ col("valid_from") :+
        col("valid_to") :+ col("version") :+ col("is_current"): _*)
  }

  /** Interval join of facts to an SCD2 dimension (the warehouse
    * pattern [[scd2]] feeds): attach to every fact row the dim
    * version whose `[valid_from, valid_to)` interval contains the
    * fact's `tsCol` — i.e. the dim value AS OF the fact's event time.
    * Facts with no covering version (before the key's first change,
    * or an unknown key) pass through with null dim columns. Fact
    * columns pass through unchanged; `dimCols` (names must not
    * collide) are appended.
    *
    * Scale shape: ONE equi-join keyed by `keyCol` with the interval
    * predicate as a residual condition — each fact matches at most
    * one version by construction (intervals per key are disjoint), so
    * the join output is |facts|, never a range-explosion. Versus
    * [[asofJoin]]: same answer when the dim comes from [[scd2]], but
    * this form joins a *materialized* history table (the common case:
    * dim history maintained incrementally, facts arriving later) and
    * needs no union/sort of facts with dim rows.
    */
  def intervalJoin(facts: DataFrame, dim: DataFrame, keyCol: String,
                   tsCol: String, dimCols: Seq[String]): DataFrame = {
    require(dimCols.nonEmpty, "intervalJoin needs at least one dim column")
    val collisions = dimCols.toSet.intersect(facts.columns.toSet)
    require(collisions.isEmpty,
      s"dim columns collide with fact columns: $collisions")
    val reserved = facts.columns.toSet
      .intersect(Set("valid_from", "valid_to", "__k"))
    require(reserved.isEmpty,
      s"fact columns collide with the join's interval columns: $reserved")
    val factCols = facts.columns.toSeq
    val d = dim.select(
      col(keyCol).as("__k"), col("valid_from"), col("valid_to"),
      struct(dimCols.map(col): _*).as("__dim"))
    facts.join(d,
        col(keyCol) === col("__k") &&
          col(tsCol) >= col("valid_from") &&
          (col("valid_to").isNull || col(tsCol) < col("valid_to")),
        "left")
      .select(factCols.map(col) ++
        dimCols.map(c => col(s"__dim.$c").as(c)): _*)
  }

  /** As-of join: for every `left` row, attach the payload of the
    * `right` row with the greatest `(tsCol, rightOrd)` such that
    * `right.ts <= left.ts`, matching on `keyCol`; nulls when no such
    * row. Left rows and their column set pass through unchanged;
    * `payload` columns (from `right`, names must not collide with
    * `left`'s) are appended.
    *
    * Ties at equal ts: the right row is visible to a left row with the
    * SAME timestamp (<=, matching the reference's cache-then-lookup
    * order where a dim/info write in batch N is visible to batch N's
    * own lookups, `DwdOrderApp.scala:196-254`), and among right rows
    * with one timestamp the greatest `rightOrd` wins.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, rightOrd: String,
               payload: Seq[String]): DataFrame =
    asofImpl(left, right, keyCol, tsCol, rightOrd, payload,
      forward = false)

  /** Forward as-of join: for every `left` row, the payload of the
    * EARLIEST `right` row with `right.ts >= left.ts` on the same key
    * (the mirror of [[asofJoin]] — "next following event" instead of
    * "latest preceding"). Ties at equal ts: the same-ts right row is
    * visible, and among right rows with one timestamp the SMALLEST
    * `rightOrd` wins (the earliest, mirroring backward's latest).
    * Same union-and-carry cost: ONE shuffle, one sort, no pair join.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, keyCol: String,
                      tsCol: String, rightOrd: String,
                      payload: Seq[String]): DataFrame =
    asofImpl(left, right, keyCol, tsCol, rightOrd, payload,
      forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame, keyCol: String,
                       tsCol: String, rightOrd: String,
                       payload: Seq[String], forward: Boolean): DataFrame = {
    require(payload.nonEmpty, "asofJoin needs at least one payload column")
    val collisions = payload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"payload columns collide with left columns: $collisions")

    val leftCols = left.columns.toSeq
    // one struct so all carried fields come from the same right row
    val r = right.select(
      col(keyCol), col(tsCol), col(rightOrd).as("__ord"),
      struct(payload.map(col): _*).as("__pay"))
      .withColumn("__side", lit(0))
    val l = left
      .withColumn("__ord", lit(null).cast(r.schema("__ord").dataType))
      .withColumn("__pay", lit(null).cast(r.schema("__pay").dataType))
      .withColumn("__side", lit(1))

    // Backward scans time ascending; forward scans descending (so the
    // carried value is the nearest FOLLOWING row). Right rows sort
    // before left rows at equal ts in scan order either way (side
    // 0 < 1), so a same-ts right row is carried into the left row's
    // output; __ord matches the scan direction so the carried row is
    // the latest ord (backward) / earliest ord (forward) within a tie.
    val w = Window.partitionBy(col(keyCol))
      .orderBy(
        (if (forward) col(tsCol).desc else col(tsCol).asc) +:
          col("__side").asc +:
          (if (forward) Seq(col("__ord").desc) else Seq(col("__ord").asc)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__match", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col(s"__match.$c").as(c)): _*)
  }

  /** Ordered funnel analysis per group (user, session, …): for step i,
    * `step{i}_ts` = the earliest `tsCol` of an event whose `typeCol`
    * equals `steps(i-1)` AND that is at-or-after the previous step's
    * timestamp — the strict "completed the steps in order" funnel, not
    * mere per-step presence. A missed step nulls every later step (the
    * `ts >= null` predicate can never pass). Adds `n_steps_reached`.
    *
    * Shape: one conditional-min hash-agg per step plus a key-equi-join
    * back to the events for each subsequent step — all shuffles keyed
    * by the SAME group columns, so AQE/exchange-reuse keeps one
    * partitioning throughout; no windows, no pair joins, state = one
    * row per group. Step count is the recipe's length (2-5 in
    * practice), not data-driven.
    */
  def funnel(events: DataFrame, groupCols: Seq[String], tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct, got $steps")
    val gcols = groupCols.map(col)
    var acc = events.groupBy(gcols: _*)
      .agg(min(when(col(typeCol) === steps.head, col(tsCol)))
        .as("step1_ts"))
    steps.tail.zipWithIndex.foreach { case (st, idx) =>
      val i = idx + 2
      val carried = (1 until i).map(j =>
        min(col(s"step${j}_ts")).as(s"step${j}_ts"))
      val next = min(when(col(typeCol) === st &&
          col(tsCol) >= col(s"step${i - 1}_ts"), col(tsCol)))
        .as(s"step${i}_ts")
      val aggs = carried :+ next
      acc = events.join(acc, groupCols)
        .groupBy(gcols: _*)
        .agg(aggs.head, aggs.tail: _*)
    }
    val reached = steps.indices
      .map(i => when(col(s"step${i + 1}_ts").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    acc.withColumn("n_steps_reached", reached.cast("int"))
  }

  /** Retention cohorts: users grouped by their first-activity date,
    * counted per (cohort_dt, day_offset) — day_offset 0 is the cohort
    * size itself, and n_users at offset d / offset 0 is the classic
    * day-d retention curve. `dtCol` must be a DATE column.
    *
    * Shape: first-date hash-agg by user, equi-join back (both keyed by
    * user — one partitioning), a distinct on (user, cohort, offset) —
    * a user's many same-day events collapse map-side — and a final
    * count agg. No windows; every stage is a hash-agg or equi-join on
    * a bounded-cardinality key.
    */
  def retention(events: DataFrame, keyCol: String, dtCol: String): DataFrame = {
    val first = events.groupBy(col(keyCol))
      .agg(min(col(dtCol)).as("cohort_dt"))
    events.join(first, Seq(keyCol))
      .select(col(keyCol), col("cohort_dt"),
        datediff(col(dtCol), col("cohort_dt")).as("day_offset"))
      .distinct()
      .groupBy(col("cohort_dt"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Temporal holdout split + leakage report: tag events before the
    * cutoff (max date − `holdoutDays`) as `train` and the rest as
    * `eval` — `dtCol` may be DATE or TIMESTAMP (timestamps are cut at
    * their calendar date) — and report, per split, event and
    * distinct-entity counts —
    * plus an `overlap` row counting entities present in BOTH splits
    * (0 events by construction). Time-based holdouts are how
    * forecasting/ranking eval sets avoid hindsight leakage, and the
    * overlap count is the signal a GROUP-aware splitter (split by
    * entity, not by event) would drive to zero.
    *
    * Output rows: `(split ∈ {train, eval, overlap}, n_events,
    * n_users)`. Scale shape: the cutoff is one driver scalar; the tag
    * is a narrow projection; counts are two hash aggs plus one
    * distinct-key equi-join — nothing event-sized shuffles more than
    * once.
    */
  def holdoutReport(events: DataFrame, keyCol: String, dtCol: String,
                    holdoutDays: Int): DataFrame = {
    require(holdoutDays >= 1, s"holdoutDays must be >= 1, got $holdoutDays")
    // the cutoff works in DATE space regardless of dtCol's type: a
    // TimestampType column casts to its calendar date (a bare
    // max().getDate would ClassCastException on timestamps)
    val d = col(dtCol).cast("date")
    val mx = events.agg(max(d)).head().getDate(0)
    val tagged = events.select(col(keyCol).as("__u"),
      when(d >= date_sub(lit(mx), holdoutDays), lit("eval"))
        .otherwise(lit("train")).as("split"))
    val per = tagged.groupBy(col("split"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("__u")).as("n_users"))
    def users(s: String) = tagged.filter(col("split") === s)
      .select(col("__u")).distinct()
    val overlap = users("train").join(users("eval"), Seq("__u"))
      .agg(count(lit(1)).as("n_users"))
      .select(lit("overlap").as("split"), lit(0L).as("n_events"),
        col("n_users"))
    per.unionByName(overlap)
  }
}
