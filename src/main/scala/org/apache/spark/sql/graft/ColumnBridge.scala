package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column↔Expression converters —
  * Spark 4 removed the public `new Column(expr)` constructor when the
  * Column API was decoupled from Catalyst; library code defining
  * native Expressions still needs exactly this hop (the same pattern
  * Spark's own `org.apache.spark.ml` functions use internally). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register function builders into a LIVE session (extensions only
    * apply at session construction; specs share one session). */
  def register(
      spark: org.apache.spark.sql.SparkSession,
      fns: Seq[(org.apache.spark.sql.catalyst.FunctionIdentifier,
        org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
        Seq[Expression] => Expression)]): Unit =
    fns.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
