package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made `Column` wrap a ColumnNode and gated Expression↔Column
  * conversion behind `private[sql]` ExpressionUtils. Custom Catalyst expressions
  * (graft.functions.HashExpressions) need both directions, so expose them from
  * inside the sql package hierarchy — the standard pattern for libraries that
  * extend Catalyst without going through a SparkSessionExtensions registration. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
