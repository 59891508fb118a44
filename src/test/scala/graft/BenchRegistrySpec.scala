package graft

import org.scalatest.funsuite.AnyFunSuite

/** The 2×-of-baseline bench gate is only airtight if every gated query
  * has a bench row: round 8's driver bench measured 190 of the 193
  * oracle-gated queries (three landed after its bench pass). Two
  * guards here:
  *
  *  1. the CODE contract — Bench's unfiltered selection is exactly the
  *     registry, so a driver bench run after the last query lands can
  *     never under-cover by construction;
  *  2. the ARTIFACT check — when a same-round BENCH/CORRECTNESS pair
  *     with a full queries object exists in the repo, their key sets
  *     must agree (the shipped BENCH_r*.json artifacts keep only a
  *     truncated tail, so this engages only on full artifacts).
  */
class BenchRegistrySpec extends AnyFunSuite {

  test("Bench with no SPARK_GRAFT_ONLY filter runs the ENTIRE " +
      "registry; the filter selects exactly the named queries") {
    assert(Bench.select(None).keySet === SparkEntry.queries.keySet)
    assert(Bench.select(Some("q1_agg, a1_dau_total")).keySet ===
      Set("q1_agg", "a1_dau_total"))
    assert(Bench.select(Some("no_such_query")).isEmpty)
  }

  test("parseIso reads the forked re-timer's payload; missing or " +
      "empty entries stay absent") {
    assert(Bench.parseIso("""{"a":[1.5,2.0],"b_x":[0.25]}""") ===
      Map("a" -> Seq(1.5, 2.0), "b_x" -> Seq(0.25)))
    assert(Bench.parseIso("""{"a":[]}""") === Map("a" -> Seq.empty))
    assert(Bench.parseIso("{}") === Map.empty)
  }

  test("alwaysIsolate names real registry queries — the standing " +
      "re-time list cannot drift from a rename") {
    assert(Bench.alwaysIsolate.subsetOf(SparkEntry.queries.keySet),
      s"unknown queries: ${Bench.alwaysIsolate diff
        SparkEntry.queries.keySet}")
    assert(Bench.alwaysIsolate.contains("ext_dedup_editdist"))
  }

  test("chunking: assignment is a pure function of the NAME (stable " +
      "as the registry grows), covers every chunk id, and the dev " +
      "default keeps small selections in-process") {
    val names = SparkEntry.queries.keySet
    val assign = names.map(n => n -> Bench.chunkOf(n, 4)).toMap
    assert(assign.values.forall(c => c >= 0 && c < 4))
    // every chunk non-empty at registry scale — 4 forked JVMs of
    // roughly equal work, none degenerate
    assert(assign.values.toSet === Set(0, 1, 2, 3))
    val sizes = assign.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes.values.min > names.size / 10,
      s"degenerate chunk split: $sizes")
    // stability: adding queries cannot move existing ones
    assert(Bench.chunkOf("q1_agg", 4) ===
      Bench.chunkOf("q1_agg", 4))
    assert(Bench.benchChunks(241) === 4)
    assert(Bench.benchChunks(5) === 1)
  }

  test("floor trigger: loadFloor parses the committed shape, absent " +
      "file stays dark, floorRegressed fires only past " +
      "max(2x-floor, floor + half-second slack)") {
    val f = java.io.File.createTempFile("floor", ".json")
    f.deleteOnExit()
    val w = new java.io.PrintWriter(f, "UTF-8")
    w.write("""{"fast": 0.1, "big": 1.2, "zero": 0.0, "small": 0.44}""")
    w.close()
    val floor = Bench.loadFloor(f.getAbsolutePath)
    assert(floor === Map("fast" -> 0.1, "big" -> 1.2, "zero" -> 0.0,
      "small" -> 0.44))
    assert(Bench.loadFloor("/no/such/file.json") === Map.empty)
    val results = Map(
      "fast" -> Seq(0.4, 0.45),   // 4x floor, but < floor+0.5: jitter
      "big" -> Seq(3.0, 2.9),     // 2.4x floor and > floor+0.5: fires
      "small" -> Seq(0.90),       // 2.05x floor yet only 0.46 s of
                                  // drift: dark (the r13 guard put the
                                  // half-second test on the MEASURED
                                  // min and would have fired here)
      "bigok" -> Seq(3.0),        // no floor recorded: dark
      "zero" -> Seq(5.0),         // zero floor: dark (not a division)
      "crash" -> Seq(-7.0))       // sentinel: dark
    assert(Bench.floorRegressed(results, floor) === Seq("big"))
    // past BOTH terms a small-floor query still fires — the guard
    // excludes jitter, not regressions
    assert(Bench.floorRegressed(
      results.updated("small", Seq(1.1)), floor) ===
      Seq("big", "small"))
    // after a successful isolated re-time folds in a fast pass, the
    // breach clears
    assert(Bench.floorRegressed(
      results.updated("big", Seq(3.0, 2.9, 1.3)), floor) === Seq.empty)
    // the committed floor file parses and names only registry queries
    val committed = Bench.loadFloor("bench_floor.json")
    assert(committed.nonEmpty)
    assert(committed.keySet.subsetOf(SparkEntry.queries.keySet),
      s"stale floor entries: ${committed.keySet diff
        SparkEntry.queries.keySet}")
    assert(committed.contains("svc_detail_by_item") &&
      committed.contains("ext_hll_dau") &&
      committed.contains("ext_source_drift"),
      "the r12 unpinned regressions must have committed floors")
  }

  /** New-this-round queries whose first quiet-box floor has not yet
    * been merged. MUST be empty at round close — the coverage lint
    * below fails on any other gap, so the floor trigger can never
    * again be silently dark for a registry query (r13 shipped
    * ext_ks_by_source unfloored).
    */
  private val floorPending: Set[String] =
    Set.empty // r15: the 14 r14-tail queries floored from quiet runs
              // (plans/r15/bench_baseline.json + the r14 driver bench)

  test("floor coverage: every registry query has a committed floor " +
      "(new-this-round names must be explicitly grandfathered, and " +
      "that list empties at round close)") {
    val committed = Bench.loadFloor("bench_floor.json").keySet
    assert(floorPending.subsetOf(SparkEntry.queries.keySet),
      s"floorPending names unknown queries: ${
        floorPending diff SparkEntry.queries.keySet}")
    val unfloored =
      SparkEntry.queries.keySet diff committed diff floorPending
    assert(unfloored.isEmpty,
      s"registry queries with no bench_floor.json entry (merge a " +
        s"quiet run via tools/update_bench_floor.py or grandfather " +
        s"in floorPending): $unfloored")
  }

  test("streaming escalation: parse/render round-trip, lower valid " +
      "p95 wins the merge, sentinels lose to any valid reading") {
    val frag = """{"dau":{"p50_ms":2025.0,"p95_ms":5750.0},""" +
      """"knn":{"p50_ms":1187.0,"p95_ms":1362.0},""" +
      """"bt":{"p50_ms":-1.0,"p95_ms":-1.0}}"""
    val lat = Bench.parseStream(frag)
    assert(lat === Seq(
      "dau" -> ((2025.0, 5750.0)), "knn" -> ((1187.0, 1362.0)),
      "bt" -> ((-1.0, -1.0))))
    assert(Bench.renderStream(lat) === frag) // order preserved
    // only dau breaches the 40%-of-trigger escalation threshold
    assert(lat.collect {
      case (n, (_, p95)) if p95 > Bench.StreamP95EscalateMs => n
    } === Seq("dau"))
    val merged = Bench.mergeStream(lat, Map(
      "dau" -> ((348.0, 402.0)),  // re-drive better: replaces
      "knn" -> ((2000.0, 3000.0)), // re-drive worse: original stays
      "bt" -> ((210.0, 230.0))))  // crash sentinel loses to valid
    assert(merged === Seq(
      "dau" -> ((348.0, 402.0)), "knn" -> ((1187.0, 1362.0)),
      "bt" -> ((210.0, 230.0))))
    // a re-drive that itself crashed never overwrites a valid reading
    assert(Bench.mergeStream(Seq("x" -> ((100.0, 200.0))),
      Map("x" -> ((-1.0, -1.0)))) === Seq("x" -> ((100.0, 200.0))))
  }

  private def read(f: java.io.File): String = {
    val s = scala.io.Source.fromFile(f, "UTF-8")
    try s.mkString finally s.close()
  }

  private def rounds(prefix: String): Map[Int, java.io.File] =
    Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches(prefix + "_r\\d+\\.json"))
      .map(f => f.getName.replaceAll("\\D", "").toInt -> f).toMap

  // per-query correctness entries are flat objects, so top-level keys
  // are exactly the names followed by '{'
  private def correctnessKeys(txt: String): Set[String] =
    "\"([A-Za-z0-9_]+)\"\\s*:\\s*\\{".r.findAllMatchIn(txt)
      .map(_.group(1)).toSet

  // None when the artifact carries no full queries object (the
  // tail-truncated driver copies)
  private def benchKeys(txt: String): Option[Set[String]] = {
    val i = txt.indexOf("\"queries\":{")
    if (i < 0) None
    else Some("\"([A-Za-z0-9_]+)\"".r
      .findAllMatchIn(txt.substring(i + 11, txt.indexOf('}', i)))
      .map(_.group(1)).toSet)
  }

  test("a same-round full BENCH artifact, when present, measures " +
      "every CORRECTNESS-gated query") {
    val bench = rounds("BENCH")
    val corr = rounds("CORRECTNESS")
    val pairs = (bench.keySet intersect corr.keySet).toSeq.sorted
      .flatMap(n => benchKeys(read(bench(n))).map(n -> _))
    assume(pairs.nonEmpty,
      "no full same-round artifact pair in the repo (driver copies " +
        "are tail-truncated) — the code contract above still holds")
    val (n, b) = pairs.last
    val missing = correctnessKeys(read(corr(n))) diff b
    assert(missing.isEmpty,
      s"round $n gated ${missing.size} queries its bench never " +
        s"measured: $missing")
  }
}
