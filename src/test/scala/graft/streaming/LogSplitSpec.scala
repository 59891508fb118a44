package graft.streaming

import graft.SparkSpec

class LogSplitSpec extends SparkSpec {
  import spark.implicits._

  private val pageJson =
    """{"common":{"ar":"110000","ba":"Apple","ch":"appstore","is_new":"1",
      |"md":"iPhone 13","mid":"mid_1","os":"iOS 15","uid":"42","vc":"v2"},
      |"page":{"during_time":5000,"item":"101","item_type":"sku_id",
      |"last_page_id":null,"page_id":"good_detail","source_type":"promotion"},
      |"displays":[{"display_type":"promotion","item":"5","item_type":"sku_id","order":1,"pos_id":2},
      |{"display_type":"query","item":"6","item_type":"sku_id","order":2,"pos_id":3}],
      |"actions":[{"action_id":"cart_add","item":"101","item_type":"sku_id","ts":1700000001000}],
      |"ts":1700000000000}""".stripMargin.replaceAll("\n", "")

  private val startJson =
    """{"common":{"ar":"310000","ba":"Xiaomi","ch":"web","is_new":"0",
      |"md":"Mi 11","mid":"mid_2","os":"Android 12","uid":"7","vc":"v2"},
      |"start":{"entry":"icon","loading_time":1200,"open_ad_id":5,
      |"open_ad_ms":800,"open_ad_skip_ms":0},"ts":1700000005000}"""
      .stripMargin.replaceAll("\n", "")

  private val errJson =
    """{"common":{"ar":"440000","ba":"Huawei","ch":"app","is_new":"0",
      |"md":"P40","mid":"mid_3","os":"HarmonyOS","uid":"9","vc":"v1"},
      |"err":{"error_code":2633,"msg":"boom"},"ts":1700000009000}"""
      .stripMargin.replaceAll("\n", "")

  private lazy val parsed =
    LogSplit.parse(Seq(pageJson, startJson, errJson).toDF("value"))

  test("err branch captures only error records") {
    val e = LogSplit.errors(parsed).collect()
    assert(e.length == 1)
    assert(e.head.getAs[String]("mid") == "mid_3")
    assert(e.head.getAs[Long]("error_code") == 2633L)
  }

  test("page branch flattens common+page, excludes err/start records") {
    val p = LogSplit.pages(parsed).collect()
    assert(p.length == 1)
    val r = p.head
    assert(r.getAs[String]("mid") == "mid_1")
    assert(r.getAs[String]("page_id") == "good_detail")
    assert(r.getAs[String]("last_page_id") == null)
    assert(r.getAs[String]("channel") == "appstore")
  }

  test("display branch explodes per exposure with parent context") {
    val d = LogSplit.displays(parsed).collect()
    assert(d.length == 2)
    assert(d.map(_.getAs[Long]("display_order")).toSet == Set(1L, 2L))
    assert(d.forall(_.getAs[String]("mid") == "mid_1"))
  }

  test("action branch keeps per-action ts") {
    val a = LogSplit.actions(parsed).collect()
    assert(a.length == 1)
    assert(a.head.getAs[Long]("action_ts") == 1700000001000L)
    assert(!a.head.schema.fieldNames.contains("ts")) // envelope ts dropped
  }

  test("start branch captures launch records") {
    val s = LogSplit.starts(parsed).collect()
    assert(s.length == 1)
    assert(s.head.getAs[String]("mid") == "mid_2")
    assert(s.head.getAs[String]("entry") == "icon")
  }

  test("split covers every record exactly once across branches") {
    val m = LogSplit.split(parsed)
    // 1 err + 1 page + 1 start top-level records; displays/actions are
    // element-level fan-out of the page record
    assert(m("DWD_ERROR_LOG_TOPIC").count() == 1)
    assert(m("DWD_PAGE_LOG_TOPIC").count() == 1)
    assert(m("DWD_START_LOG_TOPIC").count() == 1)
    assert(m("DWD_PAGE_DISPLAY_TOPIC").count() == 2)
    assert(m("DWD_PAGE_ACTION_TOPIC").count() == 1)
  }
}
