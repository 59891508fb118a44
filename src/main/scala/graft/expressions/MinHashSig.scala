package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** k-wide MinHash signature of a shingle array in ONE narrow pass — the
  * codegen replacement for explode → md5-prefix hash → k min-aggregates:
  * per row, each shingle is md5-hashed ONCE (the oracle-reproducible
  * `hash32`: first 8 hex chars of md5 as an unsigned 32-bit value) and k
  * universal-hash permutations `(2j+1)·m + 40503·(j+1) mod (2³¹−1)`
  * take running minimums in a local array. Bit-identical to the
  * aggregate form (parity-tested in DedupSpec) but the signature stage
  * needs NO shuffle — at 100 TB that deletes the (doc, shingle)
  * explode and its hash-aggregate exchange from the MinHash pipeline.
  *
  * Empty input arrays yield all-`P` signatures (the `TextFns.minhash`
  * null-pad convention); callers that must mirror the aggregate path's
  * doc-dropping semantics filter `size(sh) > 0` first. Null elements
  * are skipped.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0, "k must be positive")

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      MinHashSig.compute(input.asInstanceOf[ArrayData], k))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = classOf[MinHashSig].getName
      val arr = classOf[UnsafeArrayData].getName
      s"""
        ${ev.value} = $arr.fromPrimitiveArray(
          $cls.compute($a, $k));
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSig = copy(child = newChild)
}

object MinHashSig {

  private val P = 2147483647L // 2^31 - 1, matches TextFns.P

  private val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Oracle-reproducible 32-bit hash: first 4 md5 digest bytes as an
    * unsigned big-endian int — exactly
    * `conv(substr(md5(s), 1, 8), 16, 10)`.
    */
  def hash32(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** The full per-row signature: hash each shingle once, fold k
    * permutation minimums. Called from both interpreted eval and the
    * generated code (one static call per row keeps the md5 loop out of
    * the interpreter without inlining it into generated Java).
    */
  def compute(arr: ArrayData, k: Int): Array[Long] = {
    val sig = Array.fill(k)(P)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val m = hash32(arr.getUTF8String(i))
        var j = 0
        while (j < k) {
          val v = ((2L * j + 1) * m + 40503L * (j + 1)) % P
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      i += 1
    }
    sig
  }
}
