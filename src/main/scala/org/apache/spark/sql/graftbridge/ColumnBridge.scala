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

  /** Analyzed logical plan of a DataFrame (for wrapping in a custom
    * logical operator). */
  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Build a DataFrame from a logical plan (runs the analyzer — custom
    * nodes resolve their unresolved key/order expressions here). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Release the persisted blocks behind a `localCheckpoint()`'d
    * DataFrame: Dataset.checkpoint persists its internal RDD
    * (MEMORY_AND_DISK) and wraps it in a `LogicalRDD`, so merely
    * dropping the DataFrame reference strands the blocks until GC +
    * ContextCleaner gets around to them — an eviction-time leak for
    * any cache of checkpointed frames. The `rdd` field is
    * `private[sql]`, hence this bridge. Non-checkpointed plans are a
    * no-op. */
  def unpersistCheckpointed(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
