package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge.
  *
  * Spark 4's `Column` wraps a `ColumnNode`, and the conversion helpers in
  * `org.apache.spark.sql.classic.ExpressionUtils` are `private[sql]`. This
  * object lives in the `org.apache.spark.sql` package so graft's native
  * Catalyst expressions (graft.functions.*) can be exposed as `Column`s —
  * the same access pattern Spark extension libraries use.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function builder on an EXISTING session's registry (the
    * runtime-equivalent of injecting through SparkSessionExtensions,
    * which only applies at session build time). */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
