package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Minimal bridge into `private[sql]` surface: Column <-> Catalyst Expression
 * conversion for registering custom expressions (the supported-but-internal
 * path in Spark 4.x, where `new Column(expr)` is gone).
 */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
