package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(Expression)` constructor (Column is
  * now ColumnNode-based for Connect); `classic.ExpressionUtils` is
  * `private[sql]`. This bridge re-exports the two conversions our native
  * Catalyst expressions need. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager ColumnNode -> Catalyst conversion. `expression` returns a LAZY
    * `ColumnNodeExpression` wrapper, which DataFrame entry points convert
    * during their own analysis; an expression returned from a SQL
    * FunctionRegistry builder is past that phase, so the wrapper would
    * survive to codegen and fail as Unevaluable. Converting eagerly yields
    * the plain (unresolved) expression tree the analyzer expects. */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)
}
