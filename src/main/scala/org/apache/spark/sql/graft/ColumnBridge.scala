package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark 4's package-private Column ↔ catalyst Expression
  * conversions (org.apache.spark.sql.classic.ExpressionUtils), needed to
  * expose custom Catalyst expressions as user-facing Columns. Lives under
  * the spark.sql package solely for access; contains no Spark code.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly convert a composed Column to a concrete catalyst Expression
    * tree. [[expression]] defers via a lazy ColumnNodeExpression wrapper,
    * which DataFrame plans unwrap during their own analysis — but a SQL
    * FunctionRegistry builder must hand the analyzer a real expression tree
    * (the wrapper is opaque to it and reports NullType).
    */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
