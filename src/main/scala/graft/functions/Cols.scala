package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType}

/** Pure-`Column` helper functions — the engine's scalar-function surface.
  *
  * Everything here stays inside Catalyst/whole-stage-codegen (no Scala
  * UDFs): each helper just composes built-in expressions, so predicate
  * pushdown and codegen are preserved on the 100 TB path.
  *
  * Reference semantics replicated (file:line cites are into
  * /root/reference/):
  *  - matchAnd  — ES `matchQuery(...).operator(AND)` approximation
  *                (publisher/.../PublisherMapperImpl.java:143,191)
  *  - highlight — ES highlighter `<em>` wrapping
  *                (publisher/.../PublisherMapperImpl.java:199-218)
  *  - ageYears  — `Period.between(birthday, now).getYears`
  *                (sparkStreaming-realtime/.../DwdDauApp.scala:157-165)
  *  - dt / hr   — epoch → "yyyy-MM-dd" / hour split
  *                (DwdDauApp.scala:142,187-195)
  *  - cdcOp     — Maxwell op-type decode (OdsBaseDbApp.scala:116-126)
  *  - topicName — dynamic DWD topic synthesis (OdsBaseDbApp.scala:135)
  */
object Cols {

  /** Event date as "yyyy-MM-dd" (reference derives `dt` from epoch-ms). */
  def dt(ts: Column): Column = date_format(ts, "yyyy-MM-dd")

  /** Event hour 0-23 as INT (reference `hr` column). */
  def hr(ts: Column): Column = hour(ts)

  /** Whole years between `birth` and `asOf` — Java `Period.getYears`
    * semantics: calendar years, minus one if the anniversary hasn't
    * happened yet. Written as pure year/month/day arithmetic so the exact
    * same formula is expressible in the DuckDB oracle.
    * Precondition: `birth <= asOf` (the only case the reference hits);
    * for future birthdays this diverges from `Period.getYears`.
    */
  def ageYears(asOf: Column, birth: Column): Column =
    (year(asOf) - year(birth)) - when(
      month(asOf) < month(birth) ||
        (month(asOf) === month(birth) && dayofmonth(asOf) < dayofmonth(birth)),
      1).otherwise(0)

  /** Lower-cased whitespace tokens of `text`. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** True for a code point of a script that whitespace tokenization
    * cannot segment (CJK ideographs, kana, hangul). */
  private def unsegCp(cp: Int): Boolean = {
    import Character.UnicodeScript
    UnicodeScript.of(cp) match {
      case UnicodeScript.HAN | UnicodeScript.HIRAGANA |
          UnicodeScript.KATAKANA | UnicodeScript.HANGUL => true
      case _ => false
    }
  }

  /** True when the token carries a script that whitespace tokenization
    * cannot segment — the reference's deployment matches Chinese
    * product names through an ES analyzer
    * (PublisherMapperImpl.java:143; labels 女/男/20岁以下), which
    * whitespace-only token membership would never match.
    */
  private def unsegmented(token: String): Boolean =
    // code points, not chars: supplementary-plane ideographs (CJK
    // Ext-B+) are surrogate pairs whose halves have no script
    token.codePoints().anyMatch(unsegCp(_))

  /** CJKAnalyzer-style pieces of a query token: each contiguous
    * unsegmented-script run becomes its character BIGRAMS (single-char
    * runs stay whole), segments of other scripts inside a mixed token
    * stay whole. "小米手机" → [小米, 米手, 手机]; "小米phone" →
    * [小米, phone]; "small" → [small].
    */
  private[graft] def cjkPieces(token: String): Seq[String] = {
    val cps = token.codePoints().toArray
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < cps.length) {
      val isU = unsegCp(cps(i))
      var j = i
      while (j < cps.length && unsegCp(cps(j)) == isU) j += 1
      if (isU && j - i >= 2)
        (i until j - 1).foreach(k => out += new String(cps, k, 2))
      else out += new String(cps, i, j - i)
      i = j
    }
    out.result()
  }

  /** ES match-AND: every token of `query` must appear in `text`.
    * Whitespace-segmented tokens check token membership (one `split`,
    * N `array_contains` conjuncts); tokens carrying CJK/kana/hangul
    * fall back to substring containment — the analyzer-free analog of
    * matching unsegmented scripts (an ik-style segmenter would be the
    * production fidelity upgrade; containment of the full query token
    * is the conservative approximation). Pure-Column either way.
    */
  def matchAnd(text: Column, query: String): Column = {
    val qs = query.toLowerCase.split("\\s+").filter(_.nonEmpty)
    require(qs.nonEmpty, "matchAnd needs a non-empty query")
    qs.map { t =>
      if (unsegmented(t)) contains(lower(text), lit(t))
      else array_contains(tokens(text), t)
    }.reduce(_ && _)
  }

  /** ES match-AND in CJK-BIGRAM mode: like [[matchAnd]], but tokens
    * carrying unsegmented script are decomposed into character bigrams
    * per contiguous run ([[cjkPieces]]) and EACH bigram must appear in
    * `text` — the analyzer-free analog of ES's CJKAnalyzer /
    * ik-max-word query semantics, where a multi-word Chinese query
    * matches on shared bigrams rather than one contiguous substring.
    * EVERY piece of an unsegmented token matches by substring
    * containment — including embedded non-CJK segments ("20" inside
    * the reference's 20岁以下 label): such a segment is glued to its
    * CJK context in the text too, so token membership would reject
    * exactly the documents [[matchAnd]] accepts. Strictly looser than
    * [[matchAnd]]'s whole-token containment on CJK runs of 3+ chars
    * (the bigrams may match non-contiguously); identical on 1-2-char
    * runs and on segmented tokens.
    */
  def matchAndBigram(text: Column, query: String): Column = {
    val qs = query.toLowerCase.split("\\s+").filter(_.nonEmpty)
    require(qs.nonEmpty, "matchAndBigram needs a non-empty query")
    qs.flatMap { t =>
      if (unsegmented(t))
        cjkPieces(t).map(p => contains(lower(text), lit(p)))
      else Seq(array_contains(tokens(text), t))
    }.reduce(_ && _)
  }

  private def highlightParts(qs: Seq[String]): Seq[String] =
    qs.map { t =>
      val quoted = java.util.regex.Pattern.quote(t)
      if (unsegmented(t)) quoted else "\\b" + quoted + "\\b"
    }

  /** ES-highlighter analog: wrap every query token occurring in `text`
    * in pre/post tags — word-bounded for segmented tokens,
    * boundary-free for CJK tokens (`\b` is meaningless between
    * ideographs: Java word chars are [A-Za-z0-9_]).
    */
  def highlight(text: Column, query: String,
                pre: String = "<em>", post: String = "</em>"): Column = {
    val qs = query.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val parts = highlightParts(qs.toSeq)
    regexp_replace(text, "(?i)(" + parts.mkString("|") + ")",
      pre + "$1" + post)
  }

  /** [[highlight]] in CJK-bigram mode: highlights the [[cjkPieces]]
    * of each query token instead of whole CJK tokens (the highlighted
    * spans mirror what [[matchAndBigram]] matched on — every piece of
    * an unsegmented token is boundary-free, matching the containment
    * semantics; standalone segmented tokens stay word-bounded). The
    * regex scan is left-to-right non-overlapping, so overlapping
    * bigrams (小米/米手) wrap disjoint spans deterministically.
    */
  def highlightBigram(text: Column, query: String,
                      pre: String = "<em>",
                      post: String = "</em>"): Column = {
    val qs = query.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val parts = qs.toSeq.flatMap { t =>
      if (unsegmented(t))
        cjkPieces(t).map(java.util.regex.Pattern.quote)
      else highlightParts(Seq(t))
    }
    regexp_replace(text, "(?i)(" + parts.mkString("|") + ")",
      pre + "$1" + post)
  }

  /** Maxwell CDC op decode: insert/bootstrap-insert→I, update→U,
    * delete→D, anything else → NULL (caller filters).
    * Generalized over an arbitrary source column via the mapping arg.
    */
  def decode3(c: Column, i: Seq[String], u: Seq[String], d: Seq[String]): Column =
    when(c.isin(i: _*), "I")
      .when(c.isin(u: _*), "U")
      .when(c.isin(d: _*), "D")

  /** Dynamic Kafka topic synthesis: DWD_{TABLE}_{op}. */
  def topicName(table: Column, op: Column): Column =
    concat(lit("DWD_"), upper(table), lit("_"), op)

  // --- float-determinism helpers -------------------------------------
  // Summing doubles is partition-order dependent; the DuckDB oracle would
  // hash-mismatch on the low bits. Route money sums through DECIMAL
  // (exact, order-independent) and cast the final result to DOUBLE — both
  // engines then produce bit-identical values. This is also the right
  // call at 100 TB: decimal aggregation of money avoids drift entirely.

  /** Order-independent SUM of a double money column: exact decimal
    * accumulation, final value as double.
    */
  def decSum(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  /** Order-independent AVG: exact decimal sum / count, in double. */
  def decAvg(c: Column): Column =
    (sum(c.cast(DecimalType(18, 4))).cast(DoubleType) /
      count(c).cast(DoubleType))

  /** Exact-decimal revenue term: price * (1 - discount). */
  def discPrice(price: Column, discount: Column): Column =
    price.cast(DecimalType(18, 4)) *
      (lit(1).cast(DecimalType(18, 4)) - discount.cast(DecimalType(18, 4)))

  // --- fixed-point aggregation ---------------------------------------
  // decSum handles decimally-clean doubles (money); it does NOT make an
  // arbitrary double (an ln(), a float product) order-independent across
  // engines, because double→DECIMAL casts themselves disagree: the JVM
  // rounds the EXACT decimal expansion (BigDecimal HALF_UP) while DuckDB
  // scales in double precision — measured divergence on ln() terms at
  // scale 18. The portable form is fixed-point: quantize each term with
  // floor(x*scale + 0.5) — one double multiply and a floor, bit-identical
  // in every engine — sum the resulting LONGS (exact, order-independent,
  // map-side combinable), divide once at the end. Precision is 1/scale
  // per term; the quantization is part of the operator's contract.

  /** One fixed-point term: floor(x*scale + 0.5) as a long. `x*scale`
    * must stay within ±2^53 (exact long-in-double range) — callers pick
    * `scale` from the term's known magnitude bound.
    */
  def fxTerm(x: Column, scale: Double): Column =
    floor(x * scale + 0.5d).cast(LongType)

  /** Order-independent fixed-point SUM of a double term (long-typed;
    * convert back with [[fxVal]]).
    */
  def fxSum(x: Column, scale: Double): Column = sum(fxTerm(x, scale))

  /** A fixed-point sum back in double units. */
  def fxVal(s: Column, scale: Double): Column =
    s.cast(DoubleType) / scale
}
