package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column↔Expression converters —
  * the supported extension-point pattern for libraries that build
  * custom Catalyst expressions (Spark 4 made `new Column(expr)`
  * internal; `classic.ExpressionUtils` is its replacement).
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** EAGER ColumnNode→Catalyst conversion. `expression` wraps a
    * non-trivial Column in a lazy ColumnNodeExpression, which only the
    * Dataset API's analyzer path unwraps — an expression returned from
    * a FunctionRegistry builder must already be real Catalyst or
    * codegen dies on the wrapper. Use this for function registration.
    */
  def toCatalyst(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)
}
