package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-pipeline column functions: tokenization, shingling, deterministic
  * integer hashing, MinHash signatures, SimHash — the scalar layer under
  * the dedup/similarity operators in [[graft.operators]].
  *
  * Everything is pure-`Column` (codegen-friendly, no UDFs). Hashing is
  * md5-prefix based so the DuckDB oracle can reproduce values exactly
  * (`conv(substr(md5(x),1,8),16,10)` ≡ DuckDB
  * `CAST('0x'||substr(md5(x),1,8) AS BIGINT)`).
  *
  * Scale note (100 TB): md5-as-int is the *oracle-reproducible* hash; on
  * a real cluster swap [[hash32]] for `xxhash64(...)` (one intrinsic,
  * no string md5) — the operators take the hash column as input, so the
  * swap is a one-line change at each call site.
  */
object TextFns {

  /** Lower-cased whitespace tokens. */
  def toks(text: Column): Column = split(lower(text), "\\s+")

  /** Canonical content normalization for identity decisions: lower-case,
    * trim, collapse whitespace. The ONE definition shared by batch
    * dedup, streaming dedup and fingerprinting — batch backfills and
    * live streams must agree on document identity.
    */
  def normText(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  /** Word n-gram shingles ("a b c", n=2 → ["a b","b c"]) as strings.
    * Empty array when the doc has fewer than n tokens.
    */
  def shingles(text: Column, n: Int): Column =
    // codegen n-gram kernel (r14) — the transform/slice/array_join HOF
    // chain ran interpreted per element; coalesce keeps this function's
    // null-text contract (empty array, not null)
    coalesce(
      org.apache.spark.sql.graftbridge.Bridge.column(
        graft.expressions.WordGrams(
          org.apache.spark.sql.graftbridge.Bridge.expression(toks(text)),
          n)),
      array().cast("array<string>"))

  /** Deterministic 32-bit non-negative hash of a string: first 8 hex
    * chars of md5 as a Long (0 .. 2^32-1). Oracle-reproducible.
    */
  def hash32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast(LongType)

  /** Deterministic 60-bit non-negative hash (first 15 hex chars of md5
    * as a Long) — the uniform-variate source for sketches and weighted
    * sampling. Oracle twin:
    * `CAST('0x'||substr(md5(x),1,15) AS BIGINT)`.
    */
  def hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast(LongType)

  private val P = 2147483647L // 2^31-1, Mersenne prime

  /** The j-th MinHash permutation applied to a 32-bit hash value. */
  def perm(j: Int, h: Column): Column =
    (lit(2L * j + 1) * h + lit(40503L * (j + 1))) % P

  /** k-wide MinHash signature over an array of shingle strings: for each
    * j, min over shingles of perm(j, hash32(shingle)). NULL-safe on empty
    * arrays (signature element = P).
    */
  def minhash(shingleArr: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), j =>
      coalesce(
        array_min(transform(shingleArr, s => (
          (j * 2 + 1) * hash32(s) + (j + 1) * 40503L) % P)),
        lit(P)))

  /** LSH band signatures: group the k-wide signature into `bands` bands
    * of k/bands rows each; each band key is "bandIdx:v1,v2,..". Same band
    * key ⇔ candidate pair. Returns array of band-key strings.
    */
  def lshBands(sig: Column, k: Int, bands: Int): Column = {
    val rows = k / bands
    transform(sequence(lit(0), lit(bands - 1)), b =>
      concat_ws(":", b.cast("string"),
        array_join(slice(sig, b * rows + 1, lit(rows)), ",")))
  }

  /** 16-bit SimHash over a token array: per bit b, sum +-1 by bit b of
    * each token's hash32; bit set iff sum > 0. Ties (sum == 0) → 0.
    */
  def simhash16(tokArr: Column): Column = {
    val bits = (0 until 16).map { b =>
      val bitSum = aggregate(tokArr, lit(0L),
        (acc, t) => acc +
          when(shiftright(hash32(t), b) % 2 === 1, 1L).otherwise(-1L))
      when(bitSum > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Hamming distance between two small non-negative int hashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Count of tokens of `text` found in `words` (language-ID /
    * stopword-ratio primitive).
    */
  def hitCount(tokArr: Column, words: Seq[String]): Column =
    size(filter(tokArr, t => t.isin(words.map(lit): _*)))

  /** Unicode NFC canonicalization via the codegen
    * [[graft.expressions.NfcNormalize]] expression (DuckDB oracle twin:
    * `nfc_normalize`). Run BEFORE content hashing — composed and
    * decomposed forms of the same text must dedup together.
    */
  def nfc(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.NfcNormalize(
        org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}
