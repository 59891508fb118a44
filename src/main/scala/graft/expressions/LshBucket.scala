package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Codegen'd random-hyperplane LSH bucket id (see
  * [[graft.functions.VectorFns.lshBucket]] for the declarative
  * reference): `planes` sign bits of deterministic-hyperplane dot
  * products, packed into a Long. `seed` selects the independent hash
  * table for OR-amplification.
  *
  * Bit-identical to the HOF formulation and the DuckDB oracle: the
  * hyperplane component for global plane g, dimension i is
  * `((g*2654435761 + i*40503) % 1000003) / 1000003.0 - 0.5` (exact
  * long arithmetic, one IEEE divide + subtract), and each plane's dot
  * product accumulates sequentially in double.
  */
case class LshBucket(child: Expression, planes: Int, seed: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "lsh_bucket"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  private def hp(g: Long, i: Long): Double =
    ((g * 2654435761L + i * 40503L) % 1000003L).toDouble / 1000003.0 - 0.5

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    var bucket = 0L
    var j = 0
    while (j < planes) {
      val g = seed.toLong * planes + j
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += x.getFloat(i).toDouble * hp(g, i.toLong)
        i += 1
      }
      if (dot > 0) bucket += (1L << j)
      j += 1
    }
    bucket
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val g = ctx.freshName("g")
      val dot = ctx.freshName("dot")
      val hpv = ctx.freshName("hpv")
      val bucket = ctx.freshName("bucket")
      s"""
        final int $n = $v.numElements();
        long $bucket = 0L;
        for (int $j = 0; $j < $planes; $j++) {
          final long $g = ${seed.toLong} * $planes + $j;
          double $dot = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            final double $hpv =
              (double) (($g * 2654435761L + $i * 40503L) % 1000003L)
                / 1000003.0 - 0.5;
            $dot += (double) $v.getFloat($i) * $hpv;
          }
          if ($dot > 0) $bucket += (1L << $j);
        }
        ${ev.value} = $bucket;
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): LshBucket = copy(child = newChild)
}
