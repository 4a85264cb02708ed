package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 split the public `Column` from catalyst `Expression`s
  * (column-node API); the classic bridge is `private[sql]`. This shim —
  * placed inside the sql package hierarchy, the standard extension
  * technique — is the ONLY place graft touches non-public Spark API, and
  * only to expose custom codegen'd expressions as Columns. */
object ColumnBridge {
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
