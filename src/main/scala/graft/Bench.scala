package graft
import org.apache.spark.sql.SparkSession

object Bench {
  /** Query selection under the SPARK_GRAFT_ONLY dev filter. With no
    * filter (the driver's run) this IS the full registry — the
    * bench-covers-every-gated-query contract BenchRegistrySpec pins.
    */
  private[graft] def select(only: Option[String])
      : Map[String, (SparkSession, String) =>
          org.apache.spark.sql.DataFrame] =
    only.map(_.split(",").map(_.trim).toSet) match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None        => SparkEntry.queries
    }

  /** The bench SparkSession — local[cpus], cpus shuffle partitions
    * (the driver contract), shared by the main run and the forked
    * isolated/streaming sections so numbers are comparable.
    */
  private[graft] def mkSession(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Warm-up: pay session/parquet-footer init + first-call
    * whole-stage codegen outside the per-query timings (the heavy
    * nested-JSON queries pay multi-second one-time codegen
    * otherwise). Timed runs still run the real SF.
    */
  private[graft] def warmup(spark: SparkSession, queries: Iterable[
      (SparkSession, String) => org.apache.spark.sql.DataFrame]): Unit = {
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      "/root/testdata/sf0.001")
    graft.tables.Tables.names.foreach { t =>
      try graft.tables.Tables.load(spark, warmDir, t)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    if (new java.io.File(warmDir).isDirectory)
      queries.foreach { fn =>
        try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
  }

  /** Time one query: one UNRECORDED same-SF pass first (the warm-dir
    * warm-up does not cover AQE-replanned stages — plan shape at the
    * real SF differs, so first-run Janino codegen still lands in pass
    * 1 otherwise; observed as a 1.5-1.7x first-run spread on
    * unchanged plans), then `passes` recorded passes. The noop sink
    * materializes every output column (a bare count() lets Catalyst
    * prune projections and under-reports real work). A crashing query
    * must not masquerade as a fast timing: it returns the single
    * NEGATED wall-time sentinel instead.
    */
  private[graft] def timeQuery(spark: SparkSession, sfDir: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
      passes: Int): Seq[Double] = {
    def pass(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val t0 = System.nanoTime()
    try { pass(); Seq.fill(passes)(pass()) }
    catch { case _: Throwable => Seq(-(System.nanoTime() - t0) / 1e9) }
  }

  /** The jdk17 --add-opens set a forked bare-java Spark driver needs
    * (mirrors build.sbt / spark-submit's JavaModuleOptions).
    */
  private val jdk17AddOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** Fork `cls` as a FRESH JVM (same classpath — sbt runs forked, so
    * java.class.path is the real application classpath; env inherits)
    * and return the payload of the single stdout line starting with
    * `marker`. None on spawn failure, non-zero exit, or no marker —
    * callers fall back to the in-process path so the bench never
    * breaks on an exotic launch mechanism.
    */
  private[graft] def forkMain(cls: String, args: Seq[String],
                              marker: String): Option[String] =
    try {
      import scala.sys.process._
      val javaBin = new java.io.File(new java.io.File(
        System.getProperty("java.home"), "bin"), "java").getAbsolutePath
      val mem = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
      val cmd = Seq(javaBin) ++ jdk17AddOpens ++ Seq(s"-Xmx$mem",
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", System.getProperty("java.class.path"), cls) ++ args
      val out = new StringBuilder
      val code = Process(cmd).!(ProcessLogger(
        line => if (line.startsWith(marker)) { out ++= line; () },
        _ => ()))
      if (code == 0 && out.nonEmpty) Some(out.toString.stripPrefix(marker))
      else None
    } catch { case _: Throwable => None }

  /** Parse BenchIsolated's `{"name":[1.2,3.4],...}` payload. */
  private[graft] def parseIso(json: String): Map[String, Seq[Double]] =
    "\"([^\"]+)\":\\[([^\\]]*)\\]".r.findAllMatchIn(json).map { m =>
      m.group(1) -> m.group(2).split(",").toSeq
        .filter(_.nonEmpty).map(_.toDouble)
    }.toMap

  /** Queries re-timed in the isolated fork EVERY run, regardless of
    * pass spread (r11 verdict): the standing top cost centers, where
    * an ambient-load drift would otherwise hide inside a
    * low-spread-but-uniformly-slow triple and dodge the outlier
    * trigger two rounds running (`ext_dedup_editdist` 3.38 → 3.76 s
    * across r10→r11 with no code change and no isolation).
    */
  private[graft] val alwaysIsolate: Set[String] = Set("ext_dedup_editdist")

  /** Deterministic chunk id for a query name. Hash-of-name (not a
    * contiguous index range over the sorted registry) so a query's
    * chunk membership is stable round-over-round even as the registry
    * GROWS — new queries land in their own hash slot instead of
    * shifting every later name into a different chunk, which would
    * break cross-round per-chunk comparability.
    */
  private[graft] def chunkOf(name: String, chunks: Int): Int =
    math.floorMod(scala.util.hashing.MurmurHash3.stringHash(name), chunks)

  /** Batch-bench chunk count: the full registry in ONE JVM puts the
    * tail queries under 200+ queries of accumulated heap/GC pressure
    * (r12 verdict: three untouched tail queries read 2.2-2.8× their
    * prior-round numbers — the same disease the streaming section had
    * before its r10 fork). Default 4 forked JVMs of ~60 queries;
    * small dev selections stay in-process. SPARK_GRAFT_BENCH_CHUNKS
    * overrides (1 forces the single-JVM path).
    */
  private[graft] def benchChunks(nQueries: Int): Int = {
    val default = if (nQueries >= 60) 4 else 1
    sys.env.get("SPARK_GRAFT_BENCH_CHUNKS") match {
      case None => default
      case Some(v) => scala.util.Try(v.trim.toInt).toOption match {
        case Some(n) => n
        // degrade LOUDLY: a typo'd override must not kill the run
        // (the r13 advice), but silently running the other chunking
        // regime would corrupt floor comparability — so warn and
        // fall back
        case None =>
          System.err.println(s"[bench] ignoring malformed " +
            s"SPARK_GRAFT_BENCH_CHUNKS='$v' — using $default chunks")
          default
      }
    }
  }

  /** Per-query historical-minimum floor (`{"name":sec,...}`, committed
    * as bench_floor.json and refreshed each round from quiet-box runs)
    * — the cross-round regression trigger's reference. Empty map when
    * the file is absent/unreadable: the trigger simply stays dark.
    */
  private[graft] def loadFloor(path: String): Map[String, Double] =
    try {
      val f = new java.io.File(path)
      if (!f.isFile) Map.empty
      else {
        val src = scala.io.Source.fromFile(f, "UTF-8")
        val txt = try src.mkString finally src.close()
        "\"([^\"]+)\"\\s*:\\s*([-0-9.eE]+)".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }
    } catch { case _: Throwable => Map.empty }

  /** Cross-round regression trigger (r12 verdict): the in-run spread
    * trigger is structurally blind to a query whose passes are ALL
    * slow (uniform ambient load — r12 shipped three unpinned >2×
    * artifact-tail regressions that way). A query whose in-run min
    * exceeds [[FloorRegressFactor]]× its historical floor gets one
    * isolated-fork re-time, published under `regressed_isolated`.
    * The breach threshold is `max(2×floor, floor + FloorSlackSec)`:
    * the absolute-slack term keeps small-FLOOR queries from breaching
    * on fork-overhead + scheduler jitter (r13 verdict: a 0.44 s-floor
    * query measured 0.95 s is 2.2× its floor but only half a second
    * of drift — exactly the jitter class the guard exists to exclude,
    * and unfalsifiable by isolated re-times, which read 1.1-3× slow
    * from cold codegen). The r13 guard compared the MEASURED min
    * against 0.5 s, which exempts nothing with a small floor — wrong
    * operand.
    */
  private[graft] val FloorRegressFactor = 2.0
  private[graft] val FloorSlackSec = 0.5

  private[graft] def floorRegressed(results: Map[String, Seq[Double]],
                                    floor: Map[String, Double])
      : Seq[String] =
    results.collect {
      case (n, ps) if ps.nonEmpty &&
          floor.get(n).exists(f => f > 0 && ps.min >
            math.max(FloorRegressFactor * f, f + FloorSlackSec)) => n
    }.toSeq.sorted

  /** Parse StreamBench's `{"name":{"p50_ms":x,"p95_ms":y},...}`
    * fragment into ordered (name, (p50, p95)) pairs.
    */
  private[graft] def parseStream(json: String)
      : Seq[(String, (Double, Double))] =
    ("\"([^\"]+)\":\\{\"p50_ms\":([-0-9.eE]+),\"p95_ms\":([-0-9.eE]+)\\}"
      .r).findAllMatchIn(json).map { m =>
      m.group(1) -> (m.group(2).toDouble, m.group(3).toDouble)
    }.toSeq

  /** Render (name, (p50, p95)) pairs back to the streaming JSON
    * fragment (inverse of [[parseStream]] up to number formatting).
    */
  private[graft] def renderStream(lat: Seq[(String, (Double, Double))])
      : String =
    lat.map { case (n, (p50, p95)) =>
      s""""$n":{"p50_ms":$p50,"p95_ms":$p95}"""
    }.mkString("{", ",", "}")

  /** Streaming outlier escalation (r11 verdict: the official
    * artifact's `dau` p95 read 5750 ms — a trigger breach — while
    * every builder run read ~350 ms; StreamBench's own min-of-2 could
    * not save it because both drives sat in the same loaded window).
    * A pipeline whose min-of-2 p95 still exceeds `StreamP95EscalateMs`
    * (40 % of the 5 s trigger) gets a third drive in a FRESH forked
    * JVM; the best (lowest-p95, crash-sentinel-excluded) reading wins
    * and the artifact names the re-driven pipelines under
    * `stream_isolated`.
    */
  private[graft] val StreamP95EscalateMs = 2000.0

  /** Fold an escalation re-drive into the first readings (order
    * preserved): the lower valid p95 wins; sentinels (p95 < 0) lose
    * to any valid reading.
    */
  private[graft] def mergeStream(first: Seq[(String, (Double, Double))],
                                 redrive: Map[String, (Double, Double)])
      : Seq[(String, (Double, Double))] =
    first.map { case (name, a) =>
      name -> (redrive.get(name) match {
        case Some(b) if a._2 < 0 && b._2 >= 0 => b
        case Some(b) if b._2 >= 0 && b._2 < a._2 => b
        case _ => a
      })
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // the orchestrator JVM only needs a session for in-process
    // fallbacks (fork failure) — created lazily so the chunked path
    // measures on quiet forked heaps only
    var sparkOpt: Option[SparkSession] = None
    def session: SparkSession = sparkOpt.getOrElse {
      val s = mkSession(); sparkOpt = Some(s); s
    }
    // dev loop: SPARK_GRAFT_ONLY=q1,q2 times just those queries
    // (unset in the driver's run — full registry, same contract)
    val selected = select(sys.env.get("SPARK_GRAFT_ONLY"))
    // Three timed passes per query, min reported: single-pass numbers
    // mix steady-state plan cost with one-time JIT/codegen and GC
    // noise (observed 3x swings on identical plans run-to-run), and
    // even min-of-two can catch a sustained external CPU-contention
    // window (r02 logged 3-5x spikes on unchanged plans); the min of
    // three spread passes is the steady-state measure a long-running
    // cluster job actually sees.
    def timeInProcess(names: Iterable[String]): Map[String, Seq[Double]] = {
      val sel = select(Some(names.mkString(",")))
      warmup(session, sel.values)
      sel.map { case (name, fn) =>
        name -> timeQuery(session, sfDir, fn, passes = 3)
      }
    }
    // chunked main run (r12 verdict): the registry split across fresh
    // sequential forked JVMs so tail queries are measured on a quiet
    // heap, not under 200+ queries of accumulated GC pressure; each
    // fork repeats the warm-up discipline for its own queries. A fork
    // that fails to launch falls back in-process — the bench never
    // breaks on an exotic launch mechanism.
    val chunks = benchChunks(selected.size)
    val measured: Map[String, Seq[Double]] =
      if (chunks <= 1) timeInProcess(selected.keys)
      else selected.keys.toSeq.sorted.groupBy(chunkOf(_, chunks))
        .toSeq.sortBy(_._1)
        .flatMap { case (_, names) =>
          forkMain("graft.BenchIsolated",
              Seq(names.mkString(","), "3"), BenchIsolated.Marker)
            .map(parseIso)
            .getOrElse(timeInProcess(names))
        }.toMap
    // End-of-run outlier re-time, ISOLATED (r10 verdict): a query
    // whose pass spread exceeds 1.5x with min > 0.5 s was measured
    // under ambient shared-JVM load (GC/heap pressure from the 200+
    // queries before it — the r9/r10 "rising passes" signature, e.g.
    // svc_detail_by_item [0.65, 3.24, 3.57]). Re-time those once in a
    // FRESH forked JVM (own heap, warmed the same way) and fold the
    // isolated passes into the min, so the artifact reports plan
    // cost, not co-tenancy. Fork failure falls back to the in-run
    // numbers.
    // standing cost centers re-time unconditionally (alwaysIsolate);
    // spread outliers join them
    val outliers = (measured.collect {
      case (name, ps)
        if ps.nonEmpty && ps.min > 0.5 && ps.max / ps.min > 1.5 => name
    }.toSet ++ alwaysIsolate.filter(measured.contains)).toSeq.sorted
    val iso: Map[String, Seq[Double]] =
      if (outliers.isEmpty ||
          sys.env.get("SPARK_GRAFT_ISOLATE").contains("0")) Map.empty
      else forkMain("graft.BenchIsolated", Seq(outliers.mkString(",")),
        BenchIsolated.Marker).map(parseIso).getOrElse(Map.empty)
    val folded = measured.map { case (name, ps) =>
      // only positive isolated passes fold in: a crash INSIDE the fork
      // surfaces as a negated sentinel there, and folding it into a
      // query that succeeded in-process would flip it to "failed" and
      // corrupt the headline min
      name -> (ps ++ iso.getOrElse(name, Seq.empty).filter(_ > 0))
    }
    // cross-round regression trigger: any query whose min (isolated
    // re-times already folded) still exceeds 2x its historical floor
    // gets one more isolated-fork re-time — the uniformly-slow-triple
    // blind spot the in-run spread trigger cannot see. `floor_breached`
    // then names what STILL exceeds the floor after every fold: a
    // non-empty list is a real plan regression (or a floor needing a
    // refresh), never an unexamined ambient number.
    val floor = loadFloor(sys.env.getOrElse("SPARK_GRAFT_FLOOR_FILE",
      "bench_floor.json"))
    val regressed = floorRegressed(folded, floor)
    val regIso: Map[String, Seq[Double]] =
      if (regressed.isEmpty ||
          sys.env.get("SPARK_GRAFT_ISOLATE").contains("0")) Map.empty
      else forkMain("graft.BenchIsolated", Seq(regressed.mkString(",")),
        BenchIsolated.Marker).map(parseIso).getOrElse(Map.empty)
    val results = folded.map { case (name, ps) =>
      name -> (ps ++ regIso.getOrElse(name, Seq.empty).filter(_ > 0))
    }
    val regIsoNames = regIso.keys.toSeq.sorted.map(n => s"\"$n\"")
      .mkString("[", ",", "]")
    val breached = floorRegressed(results, floor)
      .map(n => s"\"$n\"").mkString("[", ",", "]")
    // "queries" stays name→min-sec (the driver contract); "runs" adds
    // the raw passes (isolated re-times appended) so a reader can
    // separate contention noise from a real plan regression;
    // "isolated" names the re-timed queries.
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v.min }
      .mkString("{", ",", "}")
    val runs = results
      .map { case (k, v) => s"\"" + k + "\":" + v.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v.min < 0 => s"\"$k\"" }
      .mkString("[", ",", "]")
    val isoNames = iso.keys.toSeq.sorted.map(n => s"\"$n\"")
      .mkString("[", ",", "]")
    val total = results.values.map(v => math.abs(v.min)).sum
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(sfDir)
      .map(_.group(1)).getOrElse("0")
    // streaming latency section: per-micro-batch p50/p95 execution
    // millis for the app pipelines (the reference's operating
    // envelope is 5 s micro-batches — see StreamBench). Runs in a
    // FORKED fresh JVM (r10 verdict: after the 219-query batch bench
    // the shared JVM sits under heap/GC pressure that inflated
    // streaming p95s two rounds running); in-process fallback if the
    // fork cannot launch. -1 = crashed pipeline. SPARK_GRAFT_STREAM_
    // BENCH=0 skips it.
    val stream0 =
      if (sys.env.getOrElse("SPARK_GRAFT_STREAM_BENCH", "1") == "0") "{}"
      else forkMain("graft.StreamBenchMain", Seq.empty,
          StreamBenchMain.Marker)
        .getOrElse {
          // the fallback session may be COLD under chunking (the
          // chunk forks did all the batch work) — pay first-use
          // codegen/init before the measured micro-batches, as the
          // pre-chunking shared session implicitly did
          warmup(session, selected.values)
          StreamBench.run(session,
            StreamBenchMain.envBatches, StreamBenchMain.envRows)
        }
    // streaming outlier escalation (r11 verdict): a pipeline whose
    // min-of-2 p95 still exceeds 40 % of the 5 s trigger was likely
    // measured in a loaded window (both drives share it) — re-drive
    // those in ONE more fresh forked JVM and keep the better reading.
    // Fork failure keeps the original numbers and claims no isolation.
    val lat0 = parseStream(stream0)
    val streamOutliers = lat0.collect {
      case (name, (_, p95)) if p95 > StreamP95EscalateMs => name
    }.sorted
    val (streaming, streamIso) =
      if (streamOutliers.isEmpty ||
          sys.env.get("SPARK_GRAFT_ISOLATE").contains("0"))
        (stream0, Seq.empty[String])
      else forkMain("graft.StreamBenchMain",
          Seq(streamOutliers.mkString(",")), StreamBenchMain.Marker)
        .map { payload =>
          val redrive = parseStream(payload).toMap
          (renderStream(mergeStream(lat0, redrive)), streamOutliers)
        }
        .getOrElse((stream0, Seq.empty[String]))
    val streamIsoNames = streamIso.map(n => s"\"$n\"")
      .mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$runs,"failed":$failed,"isolated":$isoNames,"regressed_isolated":$regIsoNames,"floor_breached":$breached,"chunks":$chunks,"streaming":$streaming,"stream_isolated":$streamIsoNames,"sf":$sf,"sfDir":"$sfDir"}""")
    sparkOpt.foreach(_.stop())
  }
}

/** Fresh-JVM timing of specific registry queries (forked by
  * [[Bench]]): same session shape, same warm-up discipline, one
  * unrecorded + `passes` recorded passes per query, result as one
  * marker-prefixed JSON line on stdout. Serves both roles — the
  * spread-outlier / floor-regression re-timer (default 2 passes) and
  * the chunked main run's per-chunk worker (second argument "3", the
  * main-run pass count).
  */
object BenchIsolated {
  private[graft] val Marker = "BENCHISO_JSON="

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = Bench.mkSession()
    val selected = Bench.select(args.headOption)
    Bench.warmup(spark, selected.values)
    val results = selected.map { case (name, fn) =>
      s"\"" + name + "\":" +
        Bench.timeQuery(spark, sfDir, fn, passes)
          .mkString("[", ",", "]")
    }
    println(Marker + results.mkString("{", ",", "}"))
    spark.stop()
  }
}

/** Fresh-JVM streaming latency section (forked by [[Bench]] so the
  * stateful pipelines are measured on a quiet heap, not under the
  * batch bench's end-of-run GC pressure). Emits [[StreamBench.run]]'s
  * JSON fragment as one marker-prefixed stdout line. An optional
  * comma-separated first argument restricts the run to those
  * pipelines — the escalation re-drive path ([[Bench.main]]'s
  * streaming outlier handling, the BenchIsolated pattern).
  */
object StreamBenchMain {
  private[graft] val Marker = "STREAMBENCH_JSON="

  // dev-loop knobs (unset in the driver's run — full defaults); read
  // here AND by Bench's in-process fallback, so both paths honor them
  private[graft] def envBatches: Int =
    sys.env.get("SPARK_GRAFT_STREAM_BATCHES").map(_.toInt).getOrElse(12)
  private[graft] def envRows: Int =
    sys.env.get("SPARK_GRAFT_STREAM_ROWS").map(_.toInt).getOrElse(2000)

  def main(args: Array[String]): Unit = {
    val only = args.headOption.filter(_.nonEmpty)
      .map(_.split(",").map(_.trim).toSet)
    val spark = Bench.mkSession()
    println(Marker + StreamBench.run(spark, envBatches, envRows, only))
    spark.stop()
  }
}
