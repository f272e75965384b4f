package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge into `private[sql]` Column↔Expression converters —
  * the standard pattern for Spark-native libraries that ship custom
  * Catalyst expressions (the converters are public in bytecode, Scala
  * access-scoped only). Everything else in this engine stays in `graft.*`.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Final EXECUTED (post-AQE) physical plan of a DataFrame as text —
    * for plan-shape assertions (exchange reuse, skew splits) in specs. */
  def executedPlanString(df: org.apache.spark.sql.DataFrame): String =
    df.asInstanceOf[org.apache.spark.sql.classic.DataFrame]
      .queryExecution.executedPlan.toString

  /** Register a function by name on an ALREADY-RUNNING session (the
    * `spark.sql.extensions` config only applies at session build time). */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(name, info, builder)
}
