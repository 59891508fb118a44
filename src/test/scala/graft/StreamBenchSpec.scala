package graft

/** Smoke coverage for the streaming latency harness: all four app
  * pipelines must run end to end on MemoryStream feeds and report
  * non-negative percentiles (a -1 sentinel means a pipeline crashed —
  * exactly the bitrot this spec exists to catch before the bench
  * silently reports it).
  */
class StreamBenchSpec extends SparkSpec {

  test("StreamBench drives all four pipelines and reports latencies") {
    val json = StreamBench.run(spark, batches = 3, rows = 60)
    // tiny parse — the fragment is flat {"app":{"p50_ms":x,"p95_ms":y}}
    val nums = """-?[0-9.]+""".r.findAllIn(
      json.replaceAll("p50_ms|p95_ms", "")).map(_.toDouble).toSeq
    assert(nums.size == 8, s"expected 4 apps x 2 percentiles in $json")
    Seq("log_split", "cdc_split", "dau", "order_wide").foreach(app =>
      assert(json.contains(s""""$app":"""), s"$app missing in $json"))
    nums.foreach(n => assert(n >= 0.0, s"crashed pipeline (-1) in $json"))
  }
}
