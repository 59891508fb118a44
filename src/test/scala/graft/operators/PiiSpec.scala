package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pii.detect/redact on hand-built edge cases the synthesized oracle
  * fixture doesn't reach: multiple matches per family, adjacent
  * families, no matches, null text, and the non-nesting guarantee of
  * the redaction fold.
  */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "mail a@b.co and c.d+x@e-f.org, call 410-555-123-4567"),
    (2L, "10.0.0.1 peered with 192.168.255.254"),
    (3L, "ssn 123-45-6789 next to phone 99-123-456-7890"),
    (4L, "no pii here, just 1234 numbers and a.b dots"),
    (5L, null.asInstanceOf[String]))
    .toDF("id", "text")

  test("detect counts every family independently") {
    val got = Pii.detect(docs, "id", "text")
      .orderBy("id")
      .select("n_email", "n_ipv4", "n_phone", "n_ssn", "pii_total")
      .collect()
      .map(r => (0 until 5).map(i =>
        if (r.isNullAt(i)) -1L else r.getLong(i)))
    assert(got(0) == Seq(2L, 0L, 1L, 0L, 3L))
    assert(got(1) == Seq(0L, 2L, 0L, 0L, 2L))
    assert(got(2) == Seq(0L, 0L, 1L, 1L, 2L))
    assert(got(3) == Seq(0L, 0L, 0L, 0L, 0L))
    assert(got(4) == Seq(-1L, -1L, -1L, -1L, -1L)) // null text → null counts
  }

  test("redact replaces all matches and families never nest") {
    val got = Pii.redacted(docs, "id", "text").orderBy("id")
      .select("redacted").as[String].collect()
    assert(got(0) ==
      "mail <EMAIL> and <EMAIL>, call <PHONE>")
    assert(got(1) == "<IPV4> peered with <IPV4>")
    // the SSN inside row 3 must survive as its own tag, not be eaten
    // by the phone family (3-2-4 vs 3-3-4 group widths are disjoint)
    assert(got(2) == "ssn <SSN> next to phone <PHONE>")
    assert(got(3) == "no pii here, just 1234 numbers and a.b dots")
    assert(got(4) == null)
  }

  test("a redacted corpus re-detects as PII-free") {
    val clean = Pii.detect(
      Pii.redacted(docs.filter(col("text").isNotNull), "id", "text"),
      "id", "redacted")
    assert(clean.agg(sum("pii_total")).head().getLong(0) == 0L)
  }
}
