package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql-package-private Column <-> Expression converters
  * (Spark 4 moved Column onto the column-node model, so `new Column(expr)`
  * / `col.expr` are no longer public API). Lives in org.apache.spark.sql
  * solely for access; the engine's own code stays under graft.*. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
