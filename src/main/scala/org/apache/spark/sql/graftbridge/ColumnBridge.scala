package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 decoupled `Column` from Catalyst `Expression`; the classic
  * bridge helpers are `private[sql]`. This shim (the standard extension-
  * library pattern: a helper object inside the org.apache.spark.sql
  * namespace) exposes exactly two conversions for graft's native
  * expressions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
