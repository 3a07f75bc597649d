package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters — the
  * standard shim third-party Catalyst extensions use to lift a custom
  * `Expression` into the public `Column` API (Spark 4 removed the public
  * `new Column(expr)` constructor in favor of ColumnNode).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
