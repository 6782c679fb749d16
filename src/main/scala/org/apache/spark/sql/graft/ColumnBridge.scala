package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ExpressionColumnNode, ExpressionUtils}

/** Bridge into Spark's private[sql] Column construction — the supported
  * way for a library to expose custom Catalyst Expressions as Columns
  * in Spark 4.x (Column wraps a ColumnNode, not an Expression). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
