package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into the sql-private Column↔Expression converters (Spark
  * 4 removed the public `Column.expr` / `new Column(expr)` surface). Lives
  * under org.apache.spark.sql so `private[sql]` members resolve — the same
  * injection pattern third-party Catalyst extensions use (SNIPPETS.md).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
