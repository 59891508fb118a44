package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Whole-stage-codegen Johnson–Lindenstrauss projection: one narrow
  * expression computing all `outDim` outputs of the ±1 sign-matrix
  * projection in a single compiled loop nest.
  *
  * This replaces the literal-folded formulation
  * (`array(sum-chain-of-±element_at, ...)`) whose tree was
  * outDim · inDim ≈ 4000 Catalyst nodes — analysis, optimization and
  * Janino compilation of that tree dominated small-batch latency, and
  * its generated code exceeded method-split thresholds. Here the plan
  * carries ONE node; the sign matrix rides along as a reference object.
  *
  * Numerics are BIT-IDENTICAL to the chain it replaces (and to the
  * DuckDB oracle text built by `Projection.oracleDim`): per output dim
  * the signed terms accumulate left-to-right in ascending input-dim
  * order starting FROM the first term (not from 0.0, so a -0.0-only
  * row cannot flip sign bits), then one multiply by the exact
  * 1/√outDim scale. Inputs widen losslessly from float.
  *
  * Null contract: null input → null; an input shorter than `inDim` →
  * null (the element_at-beyond-length behavior of the old chain); a
  * null ELEMENT among the first `inDim` → null (the chain's null
  * propagation — never an undefined garbage read).
  */
case class JlProject(child: Expression, inDim: Int, outDim: Int,
                     scale: Double, signs: Array[Byte])
    extends UnaryExpression {

  require(signs.length == inDim * outDim,
    s"sign matrix must be inDim*outDim = ${inDim * outDim}, got ${signs.length}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "jl_project"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${t.simpleString}")
  }

  private def childIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() < inDim) null
    else {
      val isD = childIsDouble
      val x = new Array[Double](inDim)
      var i = 0
      while (i < inDim) {
        if (a.isNullAt(i)) return null
        x(i) = if (isD) a.getDouble(i) else a.getFloat(i).toDouble
        i += 1
      }
      val out = new Array[Double](outDim)
      var j = 0
      while (j < outDim) {
        val off = j * inDim
        var s = if (signs(off) > 0) x(0) else -x(0)
        i = 1
        while (i < inDim) {
          s += (if (signs(off + i) > 0) x(i) else -x(i))
          i += 1
        }
        out(j) = scale * s
        j += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sg = ctx.addReferenceObj("jlSigns", signs, "byte[]")
      val x = ctx.freshName("x")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      val s = ctx.freshName("s")
      val elem =
        if (childIsDouble) s"$a.getDouble($i)"
        else s"(double) $a.getFloat($i)"
      s"""
        if ($a.numElements() < $inDim) {
          ${ev.isNull} = true;
        } else {
          final double[] $x = new double[$inDim];
          for (int $i = 0; $i < $inDim; $i++) {
            if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
            $x[$i] = $elem;
          }
          final double[] $out = new double[$outDim];
          if (!${ev.isNull}) for (int $j = 0; $j < $outDim; $j++) {
            final int $off = $j * $inDim;
            double $s = $sg[$off] > 0 ? $x[0] : -$x[0];
            for (int $i = 1; $i < $inDim; $i++) {
              $s += $sg[$off + $i] > 0 ? $x[$i] : -$x[$i];
            }
            $out[$j] = $scale * $s;
          }
          if (!${ev.isNull}) {
            ${ev.value} =
              org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
                .fromPrimitiveArray($out);
          }
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): JlProject =
    copy(child = newChild)
}
