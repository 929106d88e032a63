package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column<->Expression converters of
  * Spark 4's classic API (org.apache.spark.sql.classic.ExpressionUtils,
  * spark-sql 4.1.2). Lives under org.apache.spark.sql so graft's custom
  * Catalyst expressions can be exposed as user-facing Columns.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
