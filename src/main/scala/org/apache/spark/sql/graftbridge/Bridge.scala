package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for the engine's custom Catalyst
  * expressions. Spark 4 moved these converters behind `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils); third-party
  * expression libraries bridge from inside the sql package — the same
  * pattern Spark connector/extension projects use.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
