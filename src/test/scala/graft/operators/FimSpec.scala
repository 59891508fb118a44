package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FimSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], rate: Int) =
    Fim.fimTransform(rows.toDF("id", "text"), "id", "text", rate)

  test("fimTransform reassembles to the original text") {
    val rows = (0L until 50L).map(i => (i, s"doc $i body ${"x" * (i % 7).toInt}"))
    val got = run(rows, 100)
      .select("text", "cut_start", "cut_end", "fim_text")
      .as[(String, Int, Int, String)].collect()
    got.foreach { case (text, s, e, fim) =>
      assert(fim.startsWith("<PRE>"))
      val pre = fim.substring(5, fim.indexOf("<SUF>"))
      val suf = fim.substring(fim.indexOf("<SUF>") + 5, fim.indexOf("<MID>"))
      val mid = fim.substring(fim.indexOf("<MID>") + 5)
      assert(pre + mid + suf === text)
      assert(pre.length === s && mid.length === e - s)
    }
  }

  test("fimTransform at rate 0 passes text through unchanged") {
    val got = run(Seq((1L, "hello world")), 0)
      .select("fim_applied", "cut_start", "cut_end", "fim_text")
      .as[(Boolean, Int, Int, String)].head()
    assert(got === ((false, -1, -1, "hello world")))
  }

  test("fimTransform rate selects a stable id-keyed subset") {
    val rows = (0L until 200L).map(i => (i, s"t$i"))
    val a = run(rows, 50).filter(col("fim_applied"))
      .select("id").as[Long].collect().toSet
    val b = run(rows, 50).filter(col("fim_applied"))
      .select("id").as[Long].collect().toSet
    assert(a === b)
    assert(a.size > 60 && a.size < 140) // ~50% of 200
    // rate is monotone: the 50% subset is inside the 80% subset
    val c = run(rows, 80).filter(col("fim_applied"))
      .select("id").as[Long].collect().toSet
    assert(a.subsetOf(c))
  }

  test("fimTransform handles empty and tiny texts") {
    val got = run(Seq((1L, ""), (2L, "a")), 100)
      .select("id", "fim_text").as[(Long, String)].collect().toMap
    assert(got(1L) === "<PRE><SUF><MID>")
    val t2 = got(2L)
    assert(Seq("<PRE>a<SUF><MID>", "<PRE><SUF>a<MID>", "<PRE><SUF><MID>a")
      .contains(t2))
  }
}
