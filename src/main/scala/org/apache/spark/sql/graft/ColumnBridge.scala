package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column ⇄ Expression converters, for
  * wiring custom Catalyst expressions ([[graft.functions.NativeExprs]])
  * into the public Column API. Lives in the `org.apache.spark.sql`
  * namespace solely to satisfy the access qualifier — the standard
  * pattern for out-of-tree Catalyst extensions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
