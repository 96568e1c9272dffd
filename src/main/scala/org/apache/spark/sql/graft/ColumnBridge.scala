package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters —
  * the standard pattern for libraries that ship custom Catalyst
  * expressions (ExpressionUtils is private[sql] in Spark 4.x, so the
  * accessor must live inside the org.apache.spark.sql namespace). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
