package org.apache.spark.sql.graftops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the sql-private Column<->Expression converters (Spark 4 moved
  * the Column constructor behind the Connect-compatible ColumnNode API; the
  * classic converters are private[sql]). Needed to expose custom Catalyst
  * aggregates/expressions as user-facing Columns. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
