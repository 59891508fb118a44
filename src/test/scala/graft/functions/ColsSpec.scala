package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ColsSpec extends SparkSpec {
  import spark.implicits._

  test("ageYears: Period.getYears semantics incl. pre-anniversary") {
    val df = Seq(
      ("2026-01-01", "2000-01-01", 26), // anniversary today
      ("2026-01-01", "2000-01-02", 25), // one day short
      ("2026-06-15", "2000-06-16", 25),
      ("2026-06-15", "2000-06-14", 26),
      ("2026-02-28", "2000-03-01", 25)
    ).toDF("asof", "birth", "expect")
    val got = df.select(
      Cols.ageYears(to_date($"asof"), to_date($"birth")).as("age"),
      $"expect").collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("matchAnd requires every query token") {
    val df = Seq("small widget deluxe", "small gizmo", "WIDGET small")
      .toDF("name")
    val got = df.filter(Cols.matchAnd($"name", "small widget"))
      .as[String].collect().toSet
    assert(got == Set("small widget deluxe", "WIDGET small"))
  }

  test("highlight wraps word-bounded case-insensitive tokens") {
    val df = Seq("Small widgets and small widget").toDF("t")
    val got = df.select(Cols.highlight($"t", "small widget"))
      .as[String].head()
    // "widgets" must NOT match (word boundary), both "small"/"Small" must
    assert(got == "<em>Small</em> widgets and <em>small</em> <em>widget</em>")
  }

  test("matchAnd falls back to containment for unsegmented scripts") {
    val df = Seq(
      "小米手机 高配版",   // unsegmented CJK run containing 小米
      "小米 手机",         // pre-segmented
      "华为手机 高配版",   // different brand — no 小米 anywhere
      "小 米手机")         // characters present but run broken
      .toDF("sku")
    val got = df.filter(Cols.matchAnd($"sku", "小米"))
      .as[String].collect().toSet
    assert(got == Set("小米手机 高配版", "小米 手机"))
    // mixed query: CJK containment AND latin token membership
    val mixed = Seq("小米手机 pro", "小米手机 max", "红米手机 pro")
      .toDF("sku")
    assert(mixed.filter(Cols.matchAnd($"sku", "小米 pro"))
      .as[String].collect().toSeq == Seq("小米手机 pro"))
  }

  test("highlight wraps CJK tokens without word boundaries") {
    val got = Seq("小米手机 with small parts").toDF("t")
      .select(Cols.highlight($"t", "small 小米"))
      .as[String].head()
    assert(got == "<em>小米</em>手机 with <em>small</em> parts")
  }

  test("cjkPieces: bigrams per run, mixed tokens split, singles whole") {
    assert(Cols.cjkPieces("小米手机") == Seq("小米", "米手", "手机"))
    assert(Cols.cjkPieces("小米phone") == Seq("小米", "phone"))
    assert(Cols.cjkPieces("小") == Seq("小"))
    assert(Cols.cjkPieces("small") == Seq("small"))
    assert(Cols.cjkPieces("a小米b") == Seq("a", "小米", "b"))
  }

  test("matchAndBigram matches on shared bigrams, not contiguous runs") {
    val df = Seq(
      "小米手机 高配版",   // contiguous run — both modes match
      "小米的手机 版",     // 小米…手机 split by 的: bigram 米手 missing
      "小米 米手 手机版",  // all three bigrams present, non-contiguous
      "华为手机 高配版")   // 小米/米手 absent
      .toDF("sku")
    val bigram = df.filter(Cols.matchAndBigram($"sku", "小米手机"))
      .as[String].collect().toSet
    assert(bigram == Set("小米手机 高配版", "小米 米手 手机版"))
    // whole-token containment would reject the non-contiguous doc
    val contain = df.filter(Cols.matchAnd($"sku", "小米手机"))
      .as[String].collect().toSet
    assert(contain == Set("小米手机 高配版"))
    // segmented tokens still use token membership in bigram mode
    assert(Seq("小米手机 pro", "小米手机 prototype").toDF("sku")
      .filter(Cols.matchAndBigram($"sku", "小米手机 pro"))
      .as[String].collect().toSeq == Seq("小米手机 pro"))
  }

  test("matchAndBigram: embedded non-CJK segments match by containment") {
    // the reference's own age label: "20" is glued to CJK context in
    // both query and text, so token membership would reject exactly
    // what matchAnd accepts — every piece of an unsegmented token
    // must match by substring
    val df = Seq("20岁以下 潮流女装", "30岁以上 正装").toDF("label")
    val got = df.filter(Cols.matchAndBigram($"label", "20岁以下"))
      .as[String].collect().toSeq
    assert(got == Seq("20岁以下 潮流女装"))
    // and stays consistent with matchAnd on the same data
    assert(df.filter(Cols.matchAnd($"label", "20岁以下"))
      .as[String].collect().toSeq == got)
  }

  test("highlightBigram wraps disjoint bigram spans deterministically") {
    val got = Seq("小米手机 with small parts").toDF("t")
      .select(Cols.highlightBigram($"t", "small 小米手机"))
      .as[String].head()
    // left-to-right scan: 小米 consumed first, 米手 overlaps → skipped,
    // 手机 matches next
    assert(got == "<em>小米</em><em>手机</em> with <em>small</em> parts")
  }

  test("decode3 maps op classes and nulls unknowns") {
    val df = Seq("insert", "bootstrap-insert", "update", "delete", "weird")
      .toDF("t")
    val got = df.select(Cols.decode3($"t",
      Seq("insert", "bootstrap-insert"), Seq("update"), Seq("delete")))
      .as[Option[String]].collect().toSeq
    assert(got == Seq(Some("I"), Some("I"), Some("U"), Some("D"), None))
  }

  test("decSum is partition-order independent") {
    val vals = (1 to 1000).map(i => i * 0.37)
    val a = vals.toDF("v").repartition(1)
      .agg(Cols.decSum($"v")).as[Double].head()
    val b = vals.reverse.toDF("v").repartition(7)
      .agg(Cols.decSum($"v")).as[Double].head()
    assert(a == b) // exact equality, not approx
  }
}
