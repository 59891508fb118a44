package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Symbol counts of a BPE merge chain applied to a token array, in ONE
  * tight per-row loop — the fused form of the per-merge `replace`
  * chain in [[graft.operators.Corpus.bpeEncode]], which re-scanned and
  * re-allocated the whole unit-separator-wrapped document string once
  * per merge (plus a per-character regexp to build the wrapped string
  * in the first place). Semantics are replicated exactly:
  *
  *  - a word's symbols start as its CODE POINTS (the
  *    `regexp_replace(.., "(\\S)", US + "$1" + US)` convention, U+001F
  *    unit separators — Java regex is code-point aware);
  *  - each merge (lhs, rhs), in step order, fuses adjacent symbol
  *    pairs LEFTMOST-NON-OVERLAPPING within a word: after a fuse the
  *    scan resumes AFTER the merged symbol, exactly where
  *    `replace(s, US+lhs+US + US+rhs+US, US+lhs+rhs+US)` resumes its
  *    search — the merged symbol can never be the LEFT element of
  *    another fuse in the same pass, and a fuse never re-examines
  *    earlier symbols;
  *  - merges never cross word boundaries (in the string form the
  *    inter-word space breaks the US-US adjacency);
  *  - null/empty tokens contribute no symbols (`array_join` skips
  *    nulls; an empty token wraps to nothing).
  *
  * Output `struct<n_sym bigint, n_bpe bigint>` — the symbol count
  * before and after the merges, which is everything every consumer of
  * the encode reads (the chain form only ever fed `length`
  * arithmetic). Null token array ⇒ null, like the chain on null text.
  */
case class BpeCounts(child: Expression, lhs: Seq[String], rhs: Seq[String])
    extends UnaryExpression {

  require(lhs.length == rhs.length,
    s"lhs/rhs merge columns must align: ${lhs.length} vs ${rhs.length}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_sym", LongType, nullable = false),
    StructField("n_bpe", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "bpe_counts"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.simpleString}")
    }

  @transient private lazy val lhsArr: Array[String] = lhs.toArray
  @transient private lazy val rhsArr: Array[String] = rhs.toArray

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** One call per row from interpreted eval and generated code. */
  def compute(arr: ArrayData): InternalRow = {
    val merges = lhsArr.length
    var nSym = 0L
    var nBpe = 0L
    val total = arr.numElements()
    var t = 0
    while (t < total) {
      if (!arr.isNullAt(t)) {
        val tok = arr.getUTF8String(t).toString
        if (tok.nonEmpty) {
          // initial symbols: one per code point
          val syms = new Array[String](tok.codePointCount(0, tok.length))
          var ci = 0
          var si = 0
          while (ci < tok.length) {
            val cp = tok.codePointAt(ci)
            syms(si) = new String(Character.toChars(cp))
            si += 1
            ci += Character.charCount(cp)
          }
          nSym += syms.length
          var n = syms.length
          var mi = 0
          while (mi < merges && n > 1) {
            val l = lhsArr(mi)
            val r = rhsArr(mi)
            // leftmost-non-overlapping fuse pass, in place
            var rd = 0
            var wr = 0
            while (rd < n) {
              if (rd + 1 < n && syms(rd) == l && syms(rd + 1) == r) {
                syms(wr) = l + r
                rd += 2
              } else {
                syms(wr) = syms(rd)
                rd += 1
              }
              wr += 1
            }
            n = wr
            mi += 1
          }
          nBpe += n
        }
      }
      t += 1
    }
    InternalRow(nSym, nBpe)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("bpeCounts", this,
        classOf[BpeCounts].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) " +
        s"$self.compute($a);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): BpeCounts = copy(child = newChild)
}
