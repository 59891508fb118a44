package graft.expressions

import org.apache.spark.sql.{AnalysisException, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions injector exposing the engine's native
  * expressions to SQL:
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)
  *     ...
  *   spark.sql("SELECT cosine_similarity(a.embedding, b.embedding) ...")
  * }}}
  *
  * Builders validate arity and literal parameters up front and raise
  * [[AnalysisException]]s under Spark's own error classes
  * (WRONG_NUM_ARGS / NON_FOLDABLE_ARGUMENT / UNEXPECTED_INPUT_TYPE), so
  * `simhash_md5(text)` or `word_shingles(text, 2.5)` fails analysis
  * with the expected signature instead of an IndexOutOfBounds /
  * NumberFormat exception from inside the builder.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName,
        "cosine_similarity"),
      (children: Seq[Expression]) => {
        checkArity("cosine_similarity", 2, children)
        CosineSimilarity(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => {
        checkArity("dot_product", 2, children)
        DotProduct(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => {
        checkArity("simhash64", 1, children)
        SimHash64(children(0))
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash_md5"),
      new ExpressionInfo(classOf[SimHashMd5].getName, "simhash_md5"),
      (children: Seq[Expression]) => {
        checkArity("simhash_md5", 2, children)
        SimHashMd5(children(0),
          intLit("simhash_md5", "bits", 1, children))
      }))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (children: Seq[Expression]) => {
        checkArity("word_shingles", 2, children)
        WordShingles(children(0), intLit("word_shingles", "n", 1, children))
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => {
        checkArity("minhash_sig", 3, children)
        MinHashSig(children(0), intLit("minhash_sig", "k", 1, children),
          intLit("minhash_sig", "shingleN", 2, children))
      }))
    ext.injectFunction((
      FunctionIdentifier("z_value"),
      new ExpressionInfo("graft.operators.Layout", "z_value"),
      (children: Seq[Expression]) => {
        // catalyst nodes directly: a function builder's children are
        // already resolved, so Column-DSL trees (which re-wrap as
        // unresolved functions) can't be returned here
        import org.apache.spark.sql.catalyst.expressions.{Add, BitwiseAnd, Cast, Multiply, ShiftRight}
        import org.apache.spark.sql.types.LongType
        checkArity("z_value", 3, children)
        val bits = intLit("z_value", "bits", 2, children)
        if (bits < 1 || bits > 31)
          throw new AnalysisException(
            errorClass = "UNEXPECTED_INPUT_TYPE",
            messageParameters = Map(
              "paramIndex" -> "3",
              "functionName" -> "`z_value`",
              "requiredType" -> "\"INT in [1, 31]\"",
              "inputSql" -> s"\"$bits\"",
              "inputType" -> "\"INT\""))
        val a = Cast(children(0), LongType)
        val b = Cast(children(1), LongType)
        def bit(e: Expression, i: Int, pos: Int): Expression =
          Multiply(
            BitwiseAnd(ShiftRight(e, Literal(i)), Literal(1L)),
            Literal(1L << pos))
        (0 until bits).flatMap(i =>
          Seq(bit(a, i, 2 * i), bit(b, i, 2 * i + 1)))
          .reduce[Expression](Add(_, _))
      }))
    ext.injectFunction((
      FunctionIdentifier("top_k_by_score"),
      new ExpressionInfo(classOf[TopKByScore].getName, "top_k_by_score"),
      (children: Seq[Expression]) => {
        checkArity("top_k_by_score", 3, children)
        TopKByScore(children(0), children(1),
          intLit("top_k_by_score", "k", 2, children))
          .toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("top_k_by_score_str"),
      new ExpressionInfo(classOf[TopKByScoreStr].getName,
        "top_k_by_score_str"),
      (children: Seq[Expression]) => {
        checkArity("top_k_by_score_str", 3, children)
        TopKByScoreStr(children(0), children(1),
          intLit("top_k_by_score_str", "k", 2, children))
          .toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => {
        checkArity("nfc_normalize", 1, children)
        NfcNormalize(children(0))
      }))
    ext.injectFunction((
      FunctionIdentifier("int8_quantize"),
      new ExpressionInfo(classOf[Int8Quantize].getName, "int8_quantize"),
      (children: Seq[Expression]) => {
        checkArity("int8_quantize", 1, children)
        Int8Quantize(children(0))
      }))
    ext.injectFunction((
      FunctionIdentifier("int8_cosine"),
      new ExpressionInfo(classOf[Int8Cosine].getName, "int8_cosine"),
      (children: Seq[Expression]) => {
        checkArity("int8_cosine", 2, children)
        Int8Cosine(children(0), children(1))
      }))
  }
}

object GraftExtensions {

  private def checkArity(name: String, n: Int,
                         children: Seq[Expression]): Unit =
    if (children.length != n)
      throw new AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> n.toString,
          "actualNum" -> children.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  /** Extract a required literal-int parameter; any integral literal
    * that fits an Int is accepted (SQL `8` parses as INT, but a BIGINT
    * or parameterized literal should work too).
    */
  private def intLit(name: String, param: String, idx: Int,
                     children: Seq[Expression]): Int =
    children(idx) match {
      case Literal(v: Int, _)                    => v
      case Literal(v: Short, _)                  => v.toInt
      case Literal(v: Byte, _)                   => v.toInt
      case Literal(v: Long, _) if v.isValidInt   => v.toInt
      case l: Literal =>
        throw new AnalysisException(
          errorClass = "UNEXPECTED_INPUT_TYPE",
          messageParameters = Map(
            "paramIndex" -> (idx + 1).toString,
            "functionName" -> s"`$name`",
            "requiredType" -> "\"INT\"",
            "inputSql" -> s"\"${l.sql}\"",
            "inputType" -> s"\"${l.dataType.sql}\""))
      case _ =>
        throw new AnalysisException(
          errorClass = "NON_FOLDABLE_ARGUMENT",
          messageParameters = Map(
            "funcName" -> s"`$name`",
            "paramName" -> s"`$param`",
            "paramType" -> "\"INT\""))
    }
}
