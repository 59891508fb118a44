package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** `bits`-wide SimHash over a token array using the oracle-reproducible
  * md5-prefix hash — the shuffle-free codegen form of the explode →
  * md5-hash → N conditional-sum aggregates stage in the md5-based
  * [[graft.operators.Dedup.simhashPairs]] paths (which must stay
  * md5-based so the DuckDB oracle can reproduce them; the xxhash64
  * production form is [[SimHash64]]). Token hash: the 32-bit md5
  * prefix ([[MinHashSig.hash32]]) for `bits` <= 32, the 64-bit prefix
  * ([[MinHashSig.hash64]]) above that — a 32-bit hash has no entropy
  * in bits 32..63, so wider signatures need the wider prefix.
  * Duplicate tokens count once per occurrence, matching the exploded
  * aggregate. Null array or EMPTY array → null (the aggregate's
  * groupBy drops zero-token docs — callers filter `isNotNull`); null
  * elements hash as 0 (the aggregate's `otherwise(-1)` branch on a
  * null md5 hash).
  */
case class SimHashMd5(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits > 0 && bits <= 64, "bits must be in 1..64")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_md5"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHashMd5.compute(input.asInstanceOf[ArrayData], bits)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = classOf[SimHashMd5].getName
      val sig = ctx.freshName("sig")
      s"""
        final Long $sig = $cls.compute($a, $bits);
        if ($sig == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $sig.longValue();
        }
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): SimHashMd5 = copy(child = newChild)
}

object SimHashMd5 {

  /** One static call per row (md5 loop stays out of generated Java and
    * the interpreter alike). Boxed return: null ⇔ empty input.
    */
  def compute(arr: ArrayData, bits: Int): java.lang.Long = {
    val n = arr.numElements()
    if (n == 0) return null
    val counters = new Array[Int](bits)
    val wide = bits > 32
    var i = 0
    while (i < n) {
      val m: Long =
        if (arr.isNullAt(i)) 0L
        else if (wide) MinHashSig.hash64(arr.getUTF8String(i))
        else MinHashSig.hash32(arr.getUTF8String(i))
      var b = 0
      while (b < bits) {
        counters(b) += (if (((m >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (counters(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
