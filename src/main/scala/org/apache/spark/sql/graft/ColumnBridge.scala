package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge into the `private[sql]` Column↔Expression converters — the standard
 * extension-library route for exposing custom Catalyst expressions as
 * `Column`s without registering SQL function names on every session
 * (Spark 4 wraps Column around ColumnNode, so `new Column(expr)` no longer
 * exists; `ExpressionUtils` is the supported internal seam).
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
