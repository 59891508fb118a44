package graft.runner

import graft.SparkSpec
import graft.sources.Sources
import graft.streaming.LogSplit
import org.apache.spark.sql.DataFrame
import java.nio.file.{Files, Paths}

/** End-to-end run of the OdsLogApp branch fan-out with the file-drop
  * source standing in for Kafka: raw envelope JSON lands in a
  * directory, one streaming query routes all five DWD branches to
  * parquet under a checkpoint. (The production app unions the branches
  * into one topic-routed Kafka write — `StreamingApps.routedPayload`,
  * covered by DauAppWiringSpec; here each branch lands in its own
  * parquet dir so the flattened per-branch schemas stay assertable.)
  */
class FileStreamAppSpec extends SparkSpec {

  private val pageJson =
    """{"common":{"ar":"110000","ba":"b","ch":"c","is_new":"1","md":"m",
      |"mid":"mid_1","os":"o","uid":"7","vc":"v"},
      |"page":{"during_time":1000,"item":"1","item_type":"sku_id",
      |"last_page_id":null,"page_id":"home","source_type":"s"},
      |"displays":[{"display_type":"promo","item":"5","item_type":"sku_id","order":1,"pos_id":2}],
      |"ts":1700000000000}""".stripMargin.replaceAll("\n", "")

  private val errJson =
    """{"common":{"ar":"1","ba":"b","ch":"c","is_new":"0","md":"m",
      |"mid":"mid_2","os":"o","uid":"8","vc":"v"},
      |"err":{"error_code":42,"msg":"boom"},"ts":1700000001000}"""
      .stripMargin.replaceAll("\n", "")

  test("file-drop OdsLogApp wiring: source → split → parquet sinks") {
    val root = Files.createTempDirectory("filestream").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    Files.writeString(Paths.get(s"$in/batch1.txt"),
      s"$pageJson\n$errJson\n")

    val parsed = LogSplit.parse(Sources.jsonLines(spark, in))
    val q = parsed.writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val cached = batch.persist()
        try LogSplit.split(cached).foreach { case (topic, branch) =>
          branch.write.mode("append").parquet(s"$root/out/$topic")
        } finally { cached.unpersist(); () }
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    def readCount(topic: String): Long =
      try spark.read.parquet(s"$root/out/$topic").count()
      catch { case _: Throwable => 0L } // branch dir absent ⇒ 0 rows

    assert(readCount("DWD_PAGE_LOG_TOPIC") == 1)
    assert(readCount("DWD_PAGE_DISPLAY_TOPIC") == 1)
    assert(readCount("DWD_ERROR_LOG_TOPIC") == 1)
    assert(readCount("DWD_START_LOG_TOPIC") == 0)
    val page = spark.read.parquet(s"$root/out/DWD_PAGE_LOG_TOPIC")
      .select("mid", "page_id").collect().head
    assert(page.getString(0) == "mid_1" && page.getString(1) == "home")
  }
}
