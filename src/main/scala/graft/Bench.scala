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

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // driver contract: bench runs local[32] with 32 shuffle partitions
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: pay session/parquet-footer init outside the per-query
    // timings
    graft.tables.Tables.names.foreach { t =>
      try graft.tables.Tables.load(spark, sfDir, t)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // JIT/codegen warm-up: run every query once at the smallest SF so
    // timed runs measure plan execution, not first-call whole-stage
    // code generation (the heavy nested-JSON queries pay multi-second
    // one-time codegen otherwise). Timings below still run the real SF.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      "/root/testdata/sf0.001")
    if (new java.io.File(warmDir).isDirectory)
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
    // noop sink: materializes every output column (a bare count() lets
    // Catalyst prune projections and under-reports real work).
    // Three timed passes per query, min reported: single-pass numbers
    // mix steady-state plan cost with one-time JIT/codegen and GC
    // noise (observed 3x swings on identical plans run-to-run), and
    // even min-of-two can catch a sustained external CPU-contention
    // window (r02 logged 3-5x spikes on unchanged plans); the min of
    // three spread passes is the steady-state measure a long-running
    // cluster job actually sees.
    // A crashing query must not masquerade as a fast timing: its
    // per-query value is NEGATED (sentinel) and its name listed under
    // "failed"; the total still counts the wall time it burned.
    // dev loop: SPARK_GRAFT_ONLY=q1,q2 times just those queries
    // (unset in the driver's run — full registry, same contract)
    val selected = select(sys.env.get("SPARK_GRAFT_ONLY"))
    val results = selected.map { case (name, fn) =>
      def pass(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val t0 = System.nanoTime()
      // one UNRECORDED same-SF pass first: the sf0.001 warm-up above
      // does not cover AQE-replanned stages (plan shape at the real SF
      // differs, so first-run Janino codegen still lands in pass 1 —
      // observed as a 1.5-1.7x first-run spread on unchanged plans).
      // Its wall time still counts against a crashing query's sentinel.
      val passes =
        try { pass(); Seq(pass(), pass(), pass()) }
        catch { case _: Throwable => Seq.empty[Double] }
      name -> (if (passes.nonEmpty) passes
               else Seq(-(System.nanoTime() - t0) / 1e9))
    }
    // "queries" stays name→min-sec (the driver contract); "runs" adds
    // the raw three passes so a reader can separate contention noise
    // (large spread, code-identical) from a real plan regression.
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v.min }
      .mkString("{", ",", "}")
    val runs = results
      .map { case (k, v) => s"\"" + k + "\":" + v.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v.min < 0 => s"\"$k\"" }
      .mkString("[", ",", "]")
    val total = results.values.map(v => math.abs(v.min)).sum
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(sfDir)
      .map(_.group(1)).getOrElse("0")
    // streaming latency section: per-micro-batch p50/p95 execution
    // millis for the four app pipelines (the reference's operating
    // envelope is 5 s micro-batches — see StreamBench). -1 = crashed.
    // SPARK_GRAFT_STREAM_BENCH=0 skips it.
    val streaming =
      if (sys.env.getOrElse("SPARK_GRAFT_STREAM_BENCH", "1") == "0") "{}"
      else StreamBench.run(spark)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$runs,"failed":$failed,"streaming":$streaming,"sf":$sf,"sfDir":"$sfDir"}""")
    spark.stop()
  }
}
