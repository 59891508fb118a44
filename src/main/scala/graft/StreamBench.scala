package graft

import graft.streaming._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming latency micro-bench: drives the four app pipelines
  * (log split, CDC split, DAU dedup+enrich, order-wide join — the
  * reference's OdsBaseLogApp/OdsBaseDbApp/DwdDauApp/DwdOrderApp
  * shadows) over MemoryStream sources, one micro-batch per feed, and
  * reports per-batch execution-latency percentiles.
  *
  * What this measures: `triggerExecution` per micro-batch — the time
  * the engine needs to process one batch end to end (source read →
  * transforms → state store → sink write). The reference operates on
  * 5 s micro-batches, so the pass criterion for its envelope is
  * p95 ≪ 5000 ms at the fed batch size. MemoryStream feeds remove
  * broker latency from the measurement, which is exactly what we
  * want: the engine's own per-batch cost, not Kafka's.
  *
  * Batches are driven synchronously (`processAllAvailable` per feed)
  * with the default immediate trigger: a ProcessingTime("5 seconds")
  * trigger would only add idle wait to every number without changing
  * the execution cost being measured. State genuinely accumulates
  * across batches (dedup state, join buffers), so later batches pay
  * realistic state-store costs.
  */
object StreamBench {

  case class Page(mid: String, user_id: String, province_id: String,
                  last_page_id: String, ts: Long)
  case class Info(id: Long, user_id: Long, province_id: String,
                  total_amount: Double, create_ts: java.sql.Timestamp)
  case class Detail(order_id: Long, detail_id: Long, sku_id: Long,
                    split_total_amount: Double,
                    create_ts: java.sql.Timestamp)
  case class Doc(doc_id: Long, text: String, ts: java.sql.Timestamp)

  /** (p50, p95) millis over the non-empty micro-batches. */
  case class Lat(p50: Double, p95: Double) {
    def json: String = s"""{"p50_ms":$p50,"p95_ms":$p95}"""
  }

  private def pct(xs: Seq[Double], p: Double): Double = {
    val s = xs.sorted
    s(math.min(s.size - 1, math.round(p * (s.size - 1)).toInt))
  }

  /** Feed `batches` micro-batches into a started query and collect
    * triggerExecution percentiles; the first batch is dropped from
    * the stats (it pays one-time codegen/state-store init that a
    * long-running app amortizes away). Zero non-empty batches (a
    * misconfigured feed) reports the distinct -2 sentinel rather than
    * masquerading as the -1 crash sentinel or throwing out of the
    * percentile math. The checkpoint dir (offsets + state store) is
    * deleted afterwards — Bench is a repeatable main and must not
    * accumulate /tmp state across runs.
    */
  private def drive(q: StreamingQuery, feed: Int => Unit,
                    batches: Int, ckptDir: String): Lat =
    try {
      (0 until batches).foreach { i => feed(i); q.processAllAvailable() }
      val durs = q.recentProgress.toSeq
        .filter(_.numInputRows > 0)
        .map(_.durationMs.get("triggerExecution").toDouble)
      val steady = if (durs.size > 1) durs.tail else durs
      if (steady.isEmpty) Lat(-2.0, -2.0)
      else Lat(pct(steady, 0.5), pct(steady, 0.95))
    } finally {
      q.stop()
      deleteRec(new java.io.File(ckptDir))
    }

  private def deleteRec(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRec)
    f.delete()
    ()
  }

  private def ckpt(name: String): String =
    java.nio.file.Files.createTempDirectory(s"sbench_$name").toString

  // ---- input synthesis (envelope JSON mirrors LogSchema) -------------

  private def logLine(i: Long, ts: Long): String = {
    val common = s""""common":{"ar":"${110000 + i % 30}","ba":"b",""" +
      s""""ch":"web","is_new":"0","md":"m","mid":"mid_${i % 1000}",""" +
      s""""os":"linux","uid":"${i % 700}","vc":"v1"}"""
    if (i % 11 == 0)
      s"""{$common,"err":{"error_code":${i % 7},"msg":"boom"},"ts":$ts}"""
    else if (i % 5 == 0)
      s"""{$common,"start":{"entry":"icon","loading_time":${i % 900},""" +
        s""""open_ad_id":1,"open_ad_ms":10,"open_ad_skip_ms":0},"ts":$ts}"""
    else {
      val last = if (i % 3 == 0) "null" else "\"home\""
      s"""{$common,"page":{"during_time":${i % 5000},"item":"sku_${i % 50}",""" +
        s""""item_type":"sku_id","last_page_id":$last,"page_id":"good_detail",""" +
        s""""source_type":"promotion"},""" +
        s""""displays":[{"display_type":"promo","item":"sku_${i % 50}",""" +
        s""""item_type":"sku_id","order":1,"pos_id":2}],""" +
        s""""actions":[{"action_id":"cart_add","item":"sku_${i % 50}",""" +
        s""""item_type":"sku_id","ts":$ts}],"ts":$ts}"""
    }
  }

  private def cdcLine(i: Long, ts: Long): String = {
    val (table, data) =
      if (i % 4 == 0)
        ("user_info", s"""{"id":"${i % 500}","gender":"F","birthday":"1995-06-15"}""")
      else if (i % 4 == 1)
        ("base_province", s"""{"id":"${i % 30}","name":"p${i % 30}","area_code":"0${i % 30}","iso_code":"CN-${i % 30}","iso_3166_2":"CN-X${i % 30}"}""")
      else
        ("order_info", s"""{"id":"$i","user_id":"${i % 700}","total_amount":"${i % 500}.5","create_time":"2023-11-14 10:00:00"}""")
    val op = if (i % 8 == 2) "update" else "insert"
    s"""{"database":"gmall","table":"$table","type":"$op","ts":$ts,"data":$data}"""
  }

  // ---- the four pipelines -------------------------------------------

  /** Log split: parse → five branches → topic-routed JSON payload
    * (the OdsLogApp per-batch shape) → noop sink.
    */
  private def benchLogSplit(spark: SparkSession, batches: Int,
                            rows: Int): Lat = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[String]
    val parsed = LogSplit.parse(src.toDF())
    val routed = LogSplit.split(parsed).map { case (topic, branch) =>
      branch.select(lit(topic).as("topic"),
        to_json(struct(branch.columns.toIndexedSeq.map(col): _*)).as("value"))
    }.reduce(_ unionByName _)
    val cp = ckpt("log")
    val q = routed.writeStream.format("noop")
      .option("checkpointLocation", cp).start()
    val t0 = 1700000000000L
    drive(q, b => {
      src.addData((0 until rows).map(r =>
        logLine(b.toLong * rows + r, t0 + b * 5000L + r)))
      ()
    }, batches, cp)
  }

  /** CDC split: Maxwell decode → fact routing + dim upsert rows
    * (the OdsDbApp per-batch shape) → noop sinks via foreachBatch.
    */
  private def benchCdcSplit(spark: SparkSession, batches: Int,
                            rows: Int): Lat = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[String]
    val decoded = CdcSplit.decoded(CdcSplit.parse(src.toDF()))
    val facts = Set("order_info")
    val dims = Set("user_info", "base_province")
    val cp = ckpt("cdc")
    val q = decoded.writeStream
      .option("checkpointLocation", cp)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val cached = batch.persist()
        try {
          CdcSplit.facts(cached, facts)
            .select(col("topic"), to_json(struct(col("table"), col("op"),
              col("ts"), col("data"))).as("value"))
            .write.format("noop").mode("overwrite").save()
          CdcSplit.dims(cached, dims, bid)
            .write.format("noop").mode("overwrite").save()
        } finally { cached.unpersist(); () }
      }.start()
    val t0 = 1700000000L
    drive(q, b => {
      src.addData((0 until rows).map(r =>
        cdcLine(b.toLong * rows + r, t0 + b * 5L)))
      ()
    }, batches, cp)
  }

  /** DAU: session-start filter → watermarked daily dedup (real state
    * store) → per-batch broadcast dim enrichment → noop sink.
    */
  private def benchDau(spark: SparkSession, batches: Int,
                       rows: Int): Lat = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[Page]
    val dimUser = (0 until 700).map(i =>
      (s"$i", if (i % 2 == 0) "F" else "M", "1995-06-15"))
      .toDF("id", "gender", "birthday")
    val dimProvince = (0 until 30).map(i =>
      (s"${110000 + i}", s"p$i", s"0$i", s"CN-$i", s"CN-X$i"))
      .toDF("id", "name", "area_code", "iso_code", "iso_3166_2")
    val deduped = DauPipeline.dedupDailyStreaming(
      DauPipeline.sessionStarts(src.toDF()))
    val cp = ckpt("dau")
    val q = deduped.writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        DauPipeline.enrich(batch, dimUser, dimProvince)
          .write.format("noop").mode("overwrite").save()
      }.start()
    val t0 = 1700000000000L
    drive(q, b => {
      // ~2/3 session starts; mids recur across batches so the dedup
      // state is genuinely consulted and grows
      src.addData((0 until rows).map { r =>
        val i = b * rows + r
        Page(s"mid_${i % (rows * 2)}", s"${i % 700}",
          s"${110000 + i % 30}", if (i % 3 == 0) "home" else null,
          t0 + b * 5000L + r)
      })
      ()
    }, batches, cp)
  }

  /** Order-wide: two watermarked streams → stream-stream join with
    * detail lagging info by one batch (the reference's arrival skew)
    * → noop sink.
    */
  private def benchOrderWide(spark: SparkSession, batches: Int,
                             rows: Int): Lat = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val infoS = MemoryStream[Info]
    val detailS = MemoryStream[Detail]
    val wide = OrderWidePipeline.orderWide(infoS.toDF(), detailS.toDF())
      .select(col("d.detail_id"), col("d.order_id"), col("d.sku_id"),
        col("i.user_id"), col("i.total_amount"),
        col("i.create_ts").as("create_ts"))
    val cp = ckpt("ow")
    val q = wide.writeStream.outputMode("append")
      .format("noop")
      .option("checkpointLocation", cp).start()
    val t0 = 1700000000000L
    drive(q, b => {
      val ts = new java.sql.Timestamp(t0 + b * 5000L)
      infoS.addData((0 until rows).map { r =>
        val id = b.toLong * rows + r
        Info(id, id % 700, s"${110000 + id % 30}", (id % 500) + 0.5, ts)
      })
      // details for the PREVIOUS batch's orders: every pair completes
      // cross-batch through the join state, like the reference's
      // detail-lags-info arrival order
      if (b > 0)
        detailS.addData((0 until rows).flatMap { r =>
          val oid = (b - 1).toLong * rows + r
          Seq(Detail(oid, oid * 2, oid % 50, (oid % 250) + 0.25, ts),
            Detail(oid, oid * 2 + 1, oid % 50, (oid % 250) + 0.25, ts))
        })
      ()
    }, batches, cp)
  }

  // ---- LLM-pipeline streaming gates ---------------------------------
  //
  // Realistic document/url/edge feeds for the cross-batch-state
  // pipelines: ids are globally unique, but CONTENT recurs with period
  // rows × 2 (the benchDau discipline), so every dedup/membership gate
  // genuinely consults — and grows — its persisted state each batch.

  /** ~30-token synthetic document; the token pool is bounded so
    * shingles/minhash find real cross-doc structure.
    */
  private def docText(i: Long): String = {
    val a = i % 97; val b = i % 31; val c = i % 13
    s"record $a describes item $b in category $c with details ${i % 7} " +
      s"and ${i % 5} shared boilerplate tokens alpha bravo charlie " +
      s"delta echo foxtrot golf hotel india juliet kilo lima $a $b $c"
  }

  private def tmpDir(name: String): String =
    java.nio.file.Files.createTempDirectory(s"sbench_$name").toString

  /** Ingest-time NEAR-dedup gate: per batch, MinHash signatures,
    * in-batch self-join, band-join against the GROWING parquet index,
    * survivor landing + index append (the full foreachBatch body a
    * production gate runs).
    */
  private def benchNearDedup(spark: SparkSession, batches: Int,
                             rows: Int): Lat = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[(Long, String)]
    val docs = src.toDF().toDF("doc_id", "text")
    val idx = tmpDir("ndd_idx"); val out = tmpDir("ndd_out")
    val cp = ckpt("ndd")
    val q = StreamingNearDedup.nearDedupSink(docs, "doc_id", "text",
        idx, out, cp, trigger = Trigger.ProcessingTime(0L)).start()
    try drive(q, b => {
      src.addData((0 until rows).map { r =>
        val i = b.toLong * rows + r; (i, docText(i % (rows * 2)))
      })
      ()
    }, batches, cp)
    finally {
      deleteRec(new java.io.File(idx)); deleteRec(new java.io.File(out))
    }
  }

  /** Cross-batch token-budget admission: SumStore rollup + broadcast
    * spend join + per-source window per batch; budgets sized so
    * sources start shutting mid-run (the gate's full regime).
    */
  private def benchQuota(spark: SparkSession, batches: Int,
                         rows: Int): Lat = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[(Long, String, String)]
    val docs = src.toDF().toDF("doc_id", "source", "text")
    val store = tmpDir("quota"); val cp = ckpt("quota")
    val q = StreamingQuota.quotaSink(docs, "source", "doc_id", "text",
        tokenBudget = 8000L, store) { admitted =>
      admitted.write.format("noop").mode("overwrite").save()
    }.option("checkpointLocation", cp).start()
    try drive(q, b => {
      src.addData((0 until rows).map { r =>
        val i = b.toLong * rows + r
        (i, s"src_${i % 64}", docText(i))
      })
      ()
    }, batches, cp)
    finally deleteRec(new java.io.File(store))
  }

  /** Quality gate → watermarked exact dedup (real state store) →
    * token annotation — the transform-only curation pipeline.
    */
  private def benchCurate(spark: SparkSession, batches: Int,
                          rows: Int): Lat = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[Doc]
    val cur = StreamingCurate.curate(src.toDF(), "text", "ts",
      minQuality = 0.3)
    val cp = ckpt("curate")
    val q = cur.writeStream.outputMode("append").format("noop")
      .option("checkpointLocation", cp).start()
    val t0 = 1700000000000L
    drive(q, b => {
      val ts = new java.sql.Timestamp(t0 + b * 5000L)
      src.addData((0 until rows).map { r =>
        val i = b.toLong * rows + r
        Doc(i, docText(i % (rows * 2)), ts)
      })
      ()
    }, batches, cp)
  }

  /** Cross-batch seen-key gate (crawl-frontier membership): one
    * left_anti join against the growing store + owned-by-path record
    * per batch.
    */
  private def benchSeen(spark: SparkSession, batches: Int,
                        rows: Int): Lat = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[String]
    val urls = src.toDF().toDF("url")
    val store = tmpDir("seen"); val cp = ckpt("seen")
    val q = urls.writeStream
      .option("checkpointLocation", cp)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        StreamingSeen.unseenAndRecord(batch, "url", store, bid)
          .write.format("noop").mode("overwrite").save()
      }.start()
    try drive(q, b => {
      src.addData((0 until rows).map { r =>
        val i = b.toLong * rows + r
        s"https://h${i % 50}.example.com/p${i % (rows * 2)}"
      })
      ()
    }, batches, cp)
    finally deleteRec(new java.io.File(store))
  }

  /** Streaming n-gram decontamination against a STATIC persisted
    * eval-gram index (opened and cached once at sink build).
    */
  private def benchDecontaminate(spark: SparkSession, batches: Int,
                                 rows: Int): Lat = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val idx = tmpDir("dec_idx"); val out = tmpDir("dec_out")
    val cp = ckpt("dec")
    // eval suite overlapping 1/3 of the stream's content pool
    graft.operators.Corpus.evalGramIndex(
        (0 until (rows / 2)).map(i => docText((i * 3).toLong))
          .toDF("text"), "text", n = 5)
      .write.mode("overwrite").parquet(idx)
    val src = MemoryStream[(Long, String)]
    val docs = src.toDF().toDF("doc_id", "text")
    val q = StreamingDecontaminate.decontaminateSink(docs, "doc_id",
        "text", idx, out, cp, n = 5, maxHitFrac = 0.0,
        trigger = Trigger.ProcessingTime(0L)).start()
    try drive(q, b => {
      src.addData((0 until rows).map { r =>
        val i = b.toLong * rows + r; (i, docText(i % (rows * 2)))
      })
      ()
    }, batches, cp)
    finally {
      spark.read.parquet(idx).unpersist() // the sink's static cache
      deleteRec(new java.io.File(idx)); deleteRec(new java.io.File(out))
    }
  }

  /** Incremental link-graph degree store: per batch one distinct +
    * degree agg on batch edges, landed as SumStore partials.
    */
  private def benchGraphDegrees(spark: SparkSession, batches: Int,
                                rows: Int): Lat = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[(Long, Long)]
    val edges = src.toDF().toDF("src", "dst")
    val store = tmpDir("deg"); val cp = ckpt("deg")
    val q = StreamingGraph.degreeSink(edges, store, "src", "dst")
      .option("checkpointLocation", cp).start()
    try drive(q, b => {
      src.addData((0 until rows).map { r =>
        val i = b.toLong * rows + r
        (i % 500, (3 * i + 7) % 500)
      })
      ()
    }, batches, cp)
    finally deleteRec(new java.io.File(store))
  }

  /** Mergeable content-manifest partials: one hash projection + one
    * shard-keyed agg per batch.
    */
  private def benchManifest(spark: SparkSession, batches: Int,
                            rows: Int): Lat = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[(Long, String)]
    val docs = src.toDF().toDF("doc_id", "text")
    val store = tmpDir("man"); val cp = ckpt("man")
    val q = StreamingManifest.manifestSink(docs, store, "doc_id",
        "text", nShards = 256)
      .option("checkpointLocation", cp).start()
    try drive(q, b => {
      src.addData((0 until rows).map { r =>
        val i = b.toLong * rows + r; (i, docText(i))
      })
      ()
    }, batches, cp)
    finally deleteRec(new java.io.File(store))
  }

  /** Preference-outcome ingestion: one (winner, loser) count partial
    * landed per batch — the StreamingBt foreachBatch body (the MM fit
    * itself is an on-demand pull, not a per-batch cost).
    */
  private def benchBt(spark: SparkSession, batches: Int,
                      rows: Int): Lat = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[(Long, Long)]
    val outcomes = src.toDF().toDF("w", "l")
    val store = tmpDir("bt"); val cp = ckpt("bt")
    val q = StreamingBt.btSink(outcomes, "w", "l", store)
      .option("checkpointLocation", cp).start()
    try drive(q, b => {
      src.addData((0 until rows).map { r =>
        val i = b.toLong * rows + r
        (i % 64, (3 * i + 7) % 64) // never equal: 2i ≡ -7 (mod 64) has
                                   // no solution (odd vs even)
      })
      ()
    }, batches, cp)
    finally deleteRec(new java.io.File(store))
  }

  /** Eval-outcome ingestion: one per-problem (n, c) count partial
    * landed per batch — the StreamingEval foreachBatch body (pass@k
    * is an on-demand pull, not a per-batch cost).
    */
  private def benchEvals(spark: SparkSession, batches: Int,
                         rows: Int): Lat = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[(Long, Boolean)]
    val samples = src.toDF().toDF("problem", "passed")
    val store = tmpDir("evals"); val cp = ckpt("evals")
    val q = StreamingEval.evalSink(samples, "problem", "passed", store)
      .option("checkpointLocation", cp).start()
    try drive(q, b => {
      src.addData((0 until rows).map { r =>
        val i = b.toLong * rows + r
        (i % 200, (i * 7) % 11 < 4)
      })
      ()
    }, batches, cp)
    finally deleteRec(new java.io.File(store))
  }

  /** Annotation-log ingestion: one (item, rater, category) count
    * partial landed per batch — the StreamingRatings foreachBatch
    * body (Fleiss' κ / rater agreement are on-demand pulls, not a
    * per-batch cost).
    */
  private def benchRatings(spark: SparkSession, batches: Int,
                           rows: Int): Lat = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[(Long, Long, Long)]
    val ratings = src.toDF().toDF("item", "rater", "cat")
    val store = tmpDir("rat"); val cp = ckpt("rat")
    val q = StreamingRatings.ratingsSink(ratings, "item", "rater",
        "cat", store)
      .option("checkpointLocation", cp).start()
    try drive(q, b => {
      src.addData((0 until rows).map { r =>
        val i = b.toLong * rows + r
        (i % 200, i % 9, if (i % 9 == 3) i % 5 else (i % 200) % 3)
      })
      ()
    }, batches, cp)
    finally deleteRec(new java.io.File(store))
  }

  /** Deterministic 64-dim float vector from an id — bounded value
    * pool so IVF cells get real multi-member structure.
    */
  private def vec(i: Long): Array[Float] =
    Array.tabulate(64)(j =>
      (((i * 31 + j * 7 + (i % 13) * j) % 97).toFloat / 97.0f) - 0.5f)

  /** Incremental-ANN ingestion: per batch, top-k probe of the batch's
    * vectors against the persisted IVF store (grown by every prior
    * batch), then the batch's own postings append — the full
    * StreamingKnn foreachBatch body over a 512-vector seed index.
    */
  private def benchKnn(spark: SparkSession, batches: Int,
                       rows: Int): Lat = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val cents = tmpDir("knn_c"); val posts = tmpDir("knn_p")
    val out = tmpDir("knn_o"); val cp = ckpt("knn")
    StreamingKnn.initIndex(
      (0 until 512).map(i => (i.toLong, vec(i.toLong)))
        .toDF("vec_id", "embedding"),
      "vec_id", "embedding", cents, posts, cells = 16)
    val src = MemoryStream[(Long, Array[Float])]
    val vecs = src.toDF().toDF("vec_id", "embedding")
    val q = StreamingKnn.knnSink(vecs, "vec_id", "embedding", cents,
        posts, out, cp, k = 5, nProbe = 4,
        trigger = Trigger.ProcessingTime(0L)).start()
    try drive(q, b => {
      src.addData((0 until rows).map { r =>
        val i = 10000L + b.toLong * rows + r; (i, vec(i))
      })
      ()
    }, batches, cp)
    finally {
      deleteRec(new java.io.File(cents)); deleteRec(new java.io.File(posts))
      deleteRec(new java.io.File(out))
    }
  }

  /** Streaming HLL register store: per-batch register partials keyed
    * by day, partition-pruned store layout.
    */
  private def benchSketch(spark: SparkSession, batches: Int,
                          rows: Int): Lat = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[(String, String)]
    val events = src.toDF().toDF("day", "user")
    val store = tmpDir("hll"); val cp = ckpt("hll")
    val q = StreamingSketch.registerSink(events, store, col("user"),
        Seq("day"))
      .option("checkpointLocation", cp).start()
    try drive(q, b => {
      src.addData((0 until rows).map { r =>
        val i = b.toLong * rows + r
        (s"2023-11-${14 + (b % 2)}", s"u${i % 5000}")
      })
      ()
    }, batches, cp)
    finally deleteRec(new java.io.File(store))
  }

  /** Streaming PSI drift monitor: per-batch binned-count partials into
    * the sum-merged drift store (read path is psiFromCounts over the
    * merged counts — the write side dominates per-batch cost).
    */
  private def benchDrift(spark: SparkSession, batches: Int,
                         rows: Int): Lat = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[Double]
    val scores = src.toDF().toDF("score")
    val store = tmpDir("drift"); val cp = ckpt("drift")
    val q = StreamingDrift.driftSink(scores, store, "score")
      .option("checkpointLocation", cp).start()
    try drive(q, b => {
      src.addData((0 until rows).map(r =>
        ((r * 7 + b * 31) % 1000) / 1000.0))
      ()
    }, batches, cp)
    finally deleteRec(new java.io.File(store))
  }

  /** Per-source streamed PSI drift monitor: per-batch (source, bin)
    * count partials into the sum-merged store — the grouped twin of
    * [[benchDrift]]; the key set gains one column, so this prices the
    * |sources|× partial-size write amplification.
    */
  private def benchDriftBySource(spark: SparkSession, batches: Int,
                                 rows: Int): Lat = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[(String, Double)]
    val scores = src.toDF().toDF("source", "score")
    val store = tmpDir("driftsrc"); val cp = ckpt("driftsrc")
    val q = StreamingDrift.driftSinkBy(scores, store, "source", "score")
      .option("checkpointLocation", cp).start()
    try drive(q, b => {
      src.addData((0 until rows).map(r =>
        (s"s${r % 8}", ((r * 7 + b * 31) % 1000) / 1000.0)))
      ()
    }, batches, cp)
    finally deleteRec(new java.io.File(store))
  }

  /** Streamed categorical (chi-squared) drift monitor: per-batch
    * per-category count partials into the sum-merged store — the
    * unordered-column companion of [[benchDrift]].
    */
  private def benchCatDrift(spark: SparkSession, batches: Int,
                            rows: Int): Lat = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[String]
    val cats = src.toDF().toDF("cat")
    val store = tmpDir("catdrift"); val cp = ckpt("catdrift")
    val q = StreamingDrift.catSink(cats, store, "cat")
      .option("checkpointLocation", cp).start()
    try drive(q, b => {
      src.addData((0 until rows).map(r =>
        s"lang${(r * 7 + b * 31) % 24}"))
      ()
    }, batches, cp)
    finally deleteRec(new java.io.File(store))
  }

  /** Streaming scorer-quality (AUC) monitor: per-batch labeled
    * score-count partials into the sum-merged store — the
    * discrimination companion of [[benchDrift]]'s distribution watch.
    */
  private def benchScorer(spark: SparkSession, batches: Int,
                          rows: Int): Lat = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[(Long, Boolean)]
    val preds = src.toDF().toDF("score_fx", "label")
    val store = tmpDir("scorer"); val cp = ckpt("scorer")
    val q = StreamingScorer.scorerSink(preds, store, "score_fx",
        "label")
      .option("checkpointLocation", cp).start()
    try drive(q, b => {
      src.addData((0 until rows).map { r =>
        val s = (r * 7 + b * 31) % 1000
        (s.toLong, (r * 13 + b) % 1000 < s) // label tracks score
      })
      ()
    }, batches, cp)
    finally deleteRec(new java.io.File(store))
  }

  /** Streamed embedding-centroid drift: per-batch (group, dim)
    * fixed-point centroid partials into the sum-merged store.
    */
  private def benchEmbedDrift(spark: SparkSession, batches: Int,
                              rows: Int): Lat = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[(String, Array[Float])]
    val vecs = src.toDF().toDF("grp", "vec")
    val store = tmpDir("edrift"); val cp = ckpt("edrift")
    val q = StreamingEmbedDrift.driftSink(vecs, store, "grp", "vec")
      .option("checkpointLocation", cp).start()
    try drive(q, b => {
      src.addData((0 until rows).map { r =>
        (s"g${r % 4}", Array.tabulate(16)(j =>
          ((r * 7 + j * 13 + b * 31) % 100) / 100f))
      })
      ()
    }, batches, cp)
    finally deleteRec(new java.io.File(store))
  }

  /** Pipeline name → the streaming source object it drives. The
    * coverage contract StreamBenchSpec lints: every
    * `streaming/Streaming*.scala` with a foreachBatch entry point
    * (plus the transform-only curation pipeline) must appear in
    * `values`, and [[apps]] must measure exactly `keySet` — so a new
    * streaming pipeline cannot land without a latency row.
    */
  private[graft] val covers: Map[String, String] = Map(
    "log_split" -> "LogSplit",
    "cdc_split" -> "CdcSplit",
    "dau" -> "DauPipeline",
    "order_wide" -> "OrderWidePipeline",
    "near_dedup" -> "StreamingNearDedup",
    "quota" -> "StreamingQuota",
    "curate" -> "StreamingCurate",
    "seen" -> "StreamingSeen",
    "decontaminate" -> "StreamingDecontaminate",
    "graph_degrees" -> "StreamingGraph",
    "manifest" -> "StreamingManifest",
    "sketch" -> "StreamingSketch",
    "knn" -> "StreamingKnn",
    "bt" -> "StreamingBt",
    "evals" -> "StreamingEval",
    "ratings" -> "StreamingRatings",
    "drift" -> "StreamingDrift",
    "drift_by_source" -> "StreamingDrift",
    "cat_drift" -> "StreamingDrift",
    "scorer" -> "StreamingScorer",
    "embed_drift" -> "StreamingEmbedDrift")

  /** The measured pipeline set — one entry per [[covers]] key. */
  private[graft] def apps(spark: SparkSession, batches: Int,
                          rows: Int): Seq[(String, () => Lat)] = Seq(
    "log_split" -> (() => benchLogSplit(spark, batches, rows)),
    "cdc_split" -> (() => benchCdcSplit(spark, batches, rows)),
    "dau" -> (() => benchDau(spark, batches, rows)),
    "order_wide" -> (() => benchOrderWide(spark, batches, rows)),
    "near_dedup" -> (() => benchNearDedup(spark, batches, rows)),
    "quota" -> (() => benchQuota(spark, batches, rows)),
    "curate" -> (() => benchCurate(spark, batches, rows)),
    "seen" -> (() => benchSeen(spark, batches, rows)),
    "decontaminate" -> (() => benchDecontaminate(spark, batches, rows)),
    "graph_degrees" -> (() => benchGraphDegrees(spark, batches, rows)),
    "manifest" -> (() => benchManifest(spark, batches, rows)),
    "sketch" -> (() => benchSketch(spark, batches, rows)),
    "knn" -> (() => benchKnn(spark, batches, rows)),
    "bt" -> (() => benchBt(spark, batches, rows)),
    "evals" -> (() => benchEvals(spark, batches, rows)),
    "ratings" -> (() => benchRatings(spark, batches, rows)),
    "drift" -> (() => benchDrift(spark, batches, rows)),
    "drift_by_source" -> (() => benchDriftBySource(spark, batches, rows)),
    "cat_drift" -> (() => benchCatDrift(spark, batches, rows)),
    "scorer" -> (() => benchScorer(spark, batches, rows)),
    "embed_drift" -> (() => benchEmbedDrift(spark, batches, rows)))

  /** Run every [[covers]] pipeline (or just `only`'s — the
    * escalation re-drive path); returns the JSON fragment for Bench's
    * output line.
    *
    * Shuffle partitions are right-sized to the micro-batch volume for
    * the streaming section (and restored after): the batch bench's 32
    * partitions are tuned for scan-heavy sf work, but a 2k-row
    * micro-batch pays per-partition state-store and task overhead on
    * every trigger — the stream-stream join's p95 drops ~4x at 8
    * partitions. This mirrors production practice: stateful streaming
    * apps size `spark.sql.shuffle.partitions` to per-batch volume
    * (state repartitioning is pinned at first checkpoint, so it is a
    * per-app launch setting, not a runtime knob).
    */
  def run(spark: SparkSession, batches: Int = 12,
          rows: Int = 2000,
          only: Option[Set[String]] = None): String = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "8")
    try {
      apps(spark, batches, rows)
        .filter { case (name, _) => only.forall(_(name)) }
        .map { case (name, f) =>
        // min-of-2 drives per pipeline (fresh checkpoint each), same
        // rationale as the batch bench's min-of-3: a single drive's
        // p95 over ~11 steady batches is one-GC-pause noisy — measured
        // 1.7x run-to-run spread (724→1210 ms) on code-identical
        // order_wide, which is exactly the r5→r6 "creep" shape. The
        // min is the steady-state cost a long-running app sees.
        val lat =
          try {
            val a = f(); val b = f()
            if (a.p95 < 0) b else if (b.p95 < 0) a
            else if (a.p95 <= b.p95) a else b
          }
          catch { case _: Throwable => Lat(-1.0, -1.0) } // sentinel
        s""""$name":${lat.json}"""
      }.mkString("{", ",", "}")
    } finally spark.conf.set(key, prev)
  }
}
