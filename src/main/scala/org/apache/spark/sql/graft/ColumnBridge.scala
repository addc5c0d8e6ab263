package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression↔Column conversion for graft's native Catalyst
  * expressions. ExpressionUtils is private[sql], so this bridge lives
  * in a subpackage of org.apache.spark.sql — the established pattern
  * for Spark extension libraries that define custom expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
