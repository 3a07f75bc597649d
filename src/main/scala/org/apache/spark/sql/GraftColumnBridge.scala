package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` Column↔Expression converters — the
  * standard shim third-party Catalyst extensions use to lift a custom
  * `Expression` into the public `Column` API (Spark 4 removed the public
  * `new Column(expr)` constructor in favor of ColumnNode).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Lift an already-analyzed `LogicalPlan` subtree back into the public
    * DataFrame API — how a physical operator re-executes a plan fragment
    * it carried past planning (the filtered-ANN route's corpus side). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
