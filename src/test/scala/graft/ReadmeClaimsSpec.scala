package graft

import org.scalatest.funsuite.AnyFunSuite

/** README claims must be derived from artifacts, not hand-updated
  * (rounds 6 and 7 both shipped stale counts). The query-count claims
  * are checkable in-JVM on every test run; the test-count claim is
  * refreshed by `tools/update_readme_counts.py` from
  * `target/test-reports` after a full `sbt test`.
  */
class ReadmeClaimsSpec extends AnyFunSuite {

  private lazy val readme = {
    val src = scala.io.Source.fromFile("README.md", "UTF-8")
    try src.mkString finally src.close()
  }

  test("every README query-count claim equals SparkEntry.queries.size") {
    val n = SparkEntry.queries.size
    val claims =
      "(\\d+) named queries".r.findAllMatchIn(readme)
        .map(_.group(1).toInt).toList ++
      "All (\\d+) match".r.findAllMatchIn(readme)
        .map(_.group(1).toInt).toList
    assert(claims.nonEmpty, "README lost its query-count claims")
    assert(claims.forall(_ == n),
      s"README claims query counts $claims but SparkEntry.queries has " +
        s"$n — run tools/update_readme_counts.py --queries $n")
  }

  test("README's test-count claim carries the script's shape") {
    // the exact count can only be known after the run completes, so
    // here we pin the claim's FORM (one regenerable line) — the script
    // rewrites the number and refuses when the reports record failures
    assert("`sbt test`: \\d+ specs/properties".r
      .findAllMatchIn(readme).size == 1,
      "README test-count line missing or duplicated — keep exactly " +
        "one '`sbt test`: N specs/properties' line for " +
        "tools/update_readme_counts.py to maintain")
  }
}
