package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.catalyst.expressions.XXH64

/** 64-bit SimHash signature of a token array in ONE narrow pass — the
  * codegen replacement for the explode → xxhash64 → 64 conditional-sum
  * aggregates formulation: per row, each token is hashed once (the same
  * `XXH64` primitive Spark's `xxhash64` builtin uses, seed 42) and 64
  * local counters take ±1 per bit; signature bit b is set iff counter b
  * ends positive. Bit-identical to the aggregate form (verified in
  * DedupSpec), but the signature stage needs NO shuffle at all — at
  * 100 TB that deletes an explode of every (doc, token) pair plus a
  * hash-aggregate exchange from the dedup pipeline.
  *
  * Null array → null; null elements hash as 0 (all bits clear → −1 per
  * counter), matching the aggregate form's `otherwise(-1)` on null
  * hashes.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counters = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val m: Long =
        if (arr.isNullAt(i)) 0L
        else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var b = 0
      while (b < 64) {
        counters(b) += (if (((m >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val cnt = ctx.freshName("cnt")
      val sig = ctx.freshName("sig")
      val xxh = classOf[XXH64].getName
      s"""
        final int $n = $a.numElements();
        final int[] $cnt = new int[64];
        for (int $i = 0; $i < $n; $i++) {
          long $m = 0L;
          if (!$a.isNullAt($i)) {
            $m = $xxh.hashUTF8String($a.getUTF8String($i), 42L);
          }
          for (int $b = 0; $b < 64; $b++) {
            $cnt[$b] += ((($m >>> $b) & 1L) == 1L) ? 1 : -1;
          }
        }
        long $sig = 0L;
        for (int $b = 0; $b < 64; $b++) {
          if ($cnt[$b] > 0) $sig |= (1L << $b);
        }
        ${ev.value} = $sig;
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): SimHash64 = copy(child = newChild)
}
