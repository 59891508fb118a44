package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a token array, built in tight Java —
  * the codegen form of `array_distinct(TextFns.shingles(...))`, whose
  * `transform`/`slice`/`array_join` higher-order functions run as
  * interpreted lambdas per element (measured ~4× slower on corpus-scale
  * inputs; see MinHashSig). Shingle text is tokens joined by single
  * spaces (the `array_join(slice(toks, i, n), " ")` convention);
  * distinctness keeps FIRST-occurrence order; fewer than n tokens ⇒
  * empty array (explode then drops the row, matching the declarative
  * form). Null token elements read as empty strings.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, "n must be positive")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = classOf[WordShingles].getName
      s"${ev.value} = $cls.compute($a, $n);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): WordShingles = copy(child = newChild)
}

/** EVERY word n-gram of a token array, in order, WITH multiplicity —
  * the language-model sibling of [[WordShingles]] (whose distinctness
  * is right for shingle indexes but loses the occurrence counts an
  * n-gram LM is built on). Same conventions: tokens joined by single
  * spaces, null tokens read as empty strings, fewer than n tokens ⇒
  * empty array. Declarative mirror: `TextFns.shingles(...)` without
  * the array_distinct — the codegen form of the per-position
  * `transform`/`concat` HOF chain the KN scorers ran (measured >3× on
  * corpus-scale inputs, r14). KNOWN DIVERGENCE on null tokens (r15
  * advice note): a null element renders as an empty string here
  * ("a" null "b" → "a  b"), whereas `array_join(slice(...))` SKIPS
  * nulls ("a b") — latent only, since every current caller feeds
  * \s+-split tokens, which are never null; callers introducing
  * nullable token arrays must pre-coalesce.
  */
case class WordGrams(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, "n must be positive")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "word_grams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WordGrams.compute(input.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = classOf[WordGrams].getName
      s"${ev.value} = $cls.compute($a, $n);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): WordGrams = copy(child = newChild)
}

object WordGrams {

  private val SPACE = UTF8String.fromString(" ")

  /** One static call per row from interpreted eval and generated code. */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val total = arr.numElements()
    if (total < n) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](total)
    var t = 0
    while (t < total) {
      toks(t) = if (arr.isNullAt(t)) UTF8String.EMPTY_UTF8
        else arr.getUTF8String(t)
      t += 1
    }
    val out = new Array[Any](total - n + 1)
    var i = 0
    while (i <= total - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks(i + j); j += 1 }
      out(i) = UTF8String.concatWs(SPACE, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** EVERY character n-gram of a string, in order, WITH multiplicity —
  * the char-LM sibling of [[WordGrams]]: the codegen form of the
  * per-position `transform(sequence(...), i => substr(t, i, n))` HOF
  * (interpreted per element). Substrings are by character (code
  * point), the `substr` convention; fewer than n chars ⇒ empty array.
  */
case class CharGrams(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, "n must be positive")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "char_grams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    CharGrams.compute(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = classOf[CharGrams].getName
      s"${ev.value} = $cls.compute($a, $n);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): CharGrams = copy(child = newChild)
}

object CharGrams {
  /** One static call per row from interpreted eval and generated code. */
  def compute(t: UTF8String, n: Int): ArrayData = {
    val len = t.numChars()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i <= len - n) {
      out(i) = t.substring(i, i + n)
      i += 1
    }
    new GenericArrayData(out)
  }
}

object WordShingles {

  private val SPACE = UTF8String.fromString(" ")

  /** THE shingle convention, in one place: distinct word n-grams of the
    * token array, first-occurrence order, tokens joined by single
    * spaces, null tokens read as empty strings. Shared by
    * [[WordShingles]] and [[MinHashSig]] so the parity-critical
    * convention cannot fork between the two tight-Java paths (the
    * declarative mirror is `array_distinct(TextFns.shingles(...))`,
    * the oracle mirror is ExtensionQueries' `shSql`).
    */
  def distinctShingles(arr: ArrayData,
                       n: Int): java.util.LinkedHashSet[UTF8String] = {
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val total = arr.numElements()
    if (total < n) return seen
    val toks = new Array[UTF8String](total)
    var t = 0
    while (t < total) {
      toks(t) = if (arr.isNullAt(t)) UTF8String.EMPTY_UTF8
        else arr.getUTF8String(t)
      t += 1
    }
    var i = 0
    while (i <= total - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks(i + j); j += 1 }
      seen.add(UTF8String.concatWs(SPACE, parts: _*))
      i += 1
    }
    seen
  }

  /** One static call per row from interpreted eval and generated code. */
  def compute(arr: ArrayData, n: Int): ArrayData =
    new GenericArrayData(distinctShingles(arr, n).toArray)
}
