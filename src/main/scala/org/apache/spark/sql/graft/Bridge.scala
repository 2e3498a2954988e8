package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Classic-mode Column ↔ Catalyst Expression bridge.
  *
  * Spark 4's Column wraps a ColumnNode (Connect refactor) and the
  * conversion helpers are `private[sql]`; this object lives under the sql
  * package namespace purely to re-export them to the graft library — the
  * standard extension-point pattern for libraries shipping custom
  * Catalyst expressions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
