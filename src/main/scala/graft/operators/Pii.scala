package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines: emails,
  * IPv4 addresses, phone numbers, SSN-style ids as regex families over
  * a text column.
  *
  * Pure-`Column` — one narrow codegen'd pass per doc, no shuffle, so
  * the operators scale as a map over the corpus at any size. Patterns
  * are deliberately RE2-compatible (no lookaround, no backreferences):
  * the exact same strings run under `java.util.regex` here and under
  * RE2 in the DuckDB oracle — and would run unchanged in a Go/Rust
  * scrubber sharing the pattern table.
  *
  * Real pipelines extend [[patterns]] (IBANs, credit cards w/ Luhn
  * post-check, national id formats); the operator shape — count per
  * family, ordered redaction fold — is what matters.
  */
object Pii {

  /** (label, RE2-safe regex). Order matters for [[redact]]: families
    * are replaced top-to-bottom, and the phone family must precede the
    * SSN family only if their matches could nest (they cannot here —
    * group widths 3-3-4 vs 3-2-4 are mutually exclusive — but keeping
    * more-specific-first is the safe convention when extending).
    */
  val patterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4" -> "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b",
    "phone" -> "\\b\\d{2,3}-\\d{3}-\\d{3}-\\d{4}\\b",
    "ssn" -> "\\b\\d{3}-\\d{2}-\\d{4}\\b")

  /** Per-doc match counts per PII family (`n_email`, `n_ipv4`,
    * `n_phone`, `n_ssn`) plus their sum `pii_total` — the columns a
    * curation gate filters or stratifies on.
    */
  def detect(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = patterns.map { case (label, pat) =>
      size(regexp_extract_all(col(textCol), lit(pat), lit(0)))
        .cast("long").as(s"n_$label")
    }
    docs.select(col(idCol) +: counts: _*)
      .withColumn("pii_total",
        patterns.map(p => col(s"n_${p._1}")).reduce(_ + _))
  }

  /** Text with every PII match replaced by its family tag
    * (`<EMAIL>`, `<IPV4>`, ...). A fold of `regexp_replace` in
    * [[patterns]] order — each family's replacement literal contains
    * no digits, so later families can never match inside an earlier
    * replacement.
    */
  def redact(text: Column): Column =
    patterns.foldLeft(text) { case (acc, (label, pat)) =>
      regexp_replace(acc, pat, s"<${label.toUpperCase}>")
    }

  /** Convenience: docs with `textCol` replaced by its redacted form. */
  def redacted(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), redact(col(textCol)).as("redacted"))
}
