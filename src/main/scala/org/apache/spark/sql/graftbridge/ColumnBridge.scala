package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's private[sql] Column↔Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils) so graft's native
  * Catalyst expressions can expose a public Column API. Standard
  * extension-library pattern; no Spark internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Full conversion through the ACTIVE session's ColumnNode converter.
    * [[expression]]'s lazy wrapper reports a VOID dataType until the
    * analyzer converts it, which breaks eager consumers (struct field
    * extraction on a FunctionRegistry macro's result); this resolves
    * the composed Column tree immediately. */
  def resolvedExpression(c: Column): Expression =
    org.apache.spark.sql.SparkSession.active
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .expression(c)
}
