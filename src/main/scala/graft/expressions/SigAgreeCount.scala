package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Whole-stage-codegen count of agreeing positions between two
  * `array<bigint>` MinHash signatures — the per-candidate-pair kernel
  * of [[graft.operators.Dedup.minhashLshPairs]] /
  * `incrementalMinhashPairs`, where the declarative form
  * `size(filter(zip_with(a, b, ===), x => x))` crosses an interpreted
  * lambda boundary per signature component per PAIR (the candidate set
  * is bucket-size², so this kernel IS the estimate stage's cost).
  *
  * Semantics match the HOF chain exactly: `zip_with` null-pads the
  * shorter array and `filter` drops null predicate results, so a
  * position counts iff both elements are present (non-null) and equal;
  * length overhang contributes nothing. Null if either array is null.
  */
case class SigAgreeCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "sig_agree_count"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    SigAgreeCount.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = SigAgreeCount.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.compute($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigAgreeCount =
    copy(left = newLeft, right = newRight)
}

object SigAgreeCount {

  /** One static call per pair from interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        c += 1
      i += 1
    }
    c
  }
}
