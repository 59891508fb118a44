package graft.extensions

/** Shared DuckDB-dialect oracle fragments — the ONE definition of the
  * tokenizer, hash and shingle macros used by every oracle, so a
  * semantics tweak cannot fork the decontamination/pipeline oracles
  * from the dedup ones (they must all mirror the same
  * [[graft.functions.TextFns]] columns).
  */
private[extensions] object OracleSql {

  /** Lower-cased whitespace tokens of `text` (mirrors TextFns.toks). */
  val TOKS = "string_split_regex(lower(text), '\\s+')"

  /** 32-bit md5-prefix hash of an expression (mirrors TextFns.hash32). */
  def h32(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 8) AS BIGINT)"

  /** Distinct word n-gram shingles of `text` (mirrors TextFns.shingles
    * + array_distinct).
    */
  def shSql(n: Int): String =
    s"list_distinct(list_transform(range(1, len($TOKS) - ${n - 2}), " +
      s"i -> array_to_string(($TOKS)[i:i+${n - 1}], ' ')))"

  /** Fixed-point order-independent SUM of a double term (mirrors
    * Cols.fxSum: quantize each term with floor(x*scale + 0.5) — exact
    * and bit-identical in both engines — then sum exact integers).
    * `scale` must be the literal text of the Spark side's double scale
    * (e.g. "1000000.0"). DuckDB sums BIGINT into HUGEINT, hence the
    * outer cast back.
    */
  def fxSql(term: String, scale: String): String =
    s"CAST(sum(CAST(floor(($term) * $scale + 0.5) AS BIGINT)) AS BIGINT)"
}
