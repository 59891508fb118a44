package graft.expressions

import graft.SparkSpec
import graft.functions.TextFns
import org.apache.spark.sql.functions._

class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  // explicit escapes only: u0301 combining acute, u1100+u1161 Hangul
  // jamo (compose to uAC00), uFF46 fullwidth f (NFC keeps it)
  private val decomposed = "e\u0301tude"
  private val composed = "\u00e9tude"
  private val cases = Seq(
    "plain ascii stays put",
    decomposed,
    composed,
    "Ame\u0301lie in Zu\u0308rich",
    "\u1100\u1161 jamo",
    "\uff46ullwidth",
    "")

  test("matches java.text.Normalizer NFC on representative forms") {
    val got = cases.toDF("t").select(TextFns.nfc(col("t"))).as[String]
      .collect()
    val want = cases.map(
      java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC))
    assert(got.toSeq === want)
    assert(got(1) === composed) // decomposed really composed
    assert(got(3) === "Am\u00e9lie in Z\u00fcrich")
    assert(got(4) === "\uac00 jamo") // jamo pair composed to one syllable
    assert(got(5) === "\uff46ullwidth") // NFC is canonical-only
  }

  test("null propagates") {
    val withNull = Seq[(java.lang.Long, String)]((1L, null), (2L, decomposed))
      .toDF("id", "t")
    val got = withNull.orderBy("id").select(TextFns.nfc(col("t")))
      .as[String].collect()
    assert(got(0) == null && got(1) === composed)
  }

  test("interpreted eval matches the static compute used by codegen") {
    import org.apache.spark.unsafe.types.UTF8String
    for (c <- cases) {
      val interp = NfcNormalize.compute(UTF8String.fromString(c)).toString
      val expect =
        java.text.Normalizer.normalize(c, java.text.Normalizer.Form.NFC)
      assert(interp === expect)
    }
  }

  test("dedup unifies composed and decomposed twins after nfc") {
    val docs = Seq((1L, "caf\u00e9 au lait"), (2L, "cafe\u0301 au lait"))
      .toDF("doc_id", "text")
    val distinctRaw = docs.select(md5(col("text"))).distinct().count()
    val distinctNfc = docs.select(md5(TextFns.nfc(col("text"))))
      .distinct().count()
    assert(distinctRaw == 2 && distinctNfc == 1)
  }
}
