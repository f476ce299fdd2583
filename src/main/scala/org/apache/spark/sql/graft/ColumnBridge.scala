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

  /** Logical plan of a DataFrame / DataFrame from a logical plan —
    * both `private[sql]` in Spark 4. */
  def plan(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.logical
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], p)

  /** A sibling session on the same SparkContext WITH the given
    * extensions applied — for exercising injected rules/strategies
    * when the default session predates them. Builder extensions only
    * apply when a NEW session is created, so the default/active
    * session registrations are cleared around the build and restored
    * after. */
  def sessionWithExtensions(
      spark: org.apache.spark.sql.SparkSession,
      f: org.apache.spark.sql.SparkSessionExtensions => Unit): org.apache.spark.sql.SparkSession = {
    import org.apache.spark.sql.SparkSession
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try SparkSession.builder().withExtensions(f).getOrCreate()
    finally {
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }

  /** Drain the listener bus — lets specs count jobs deterministically
    * (the bus delivers SparkListener events asynchronously). */
  def drainListenerBus(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Free the storage blocks behind a checkpointed/materialized frame
    * (Tables.materialize): localCheckpoint persists the underlying RDD
    * OUTSIDE the CacheManager, so `Dataset.unpersist` cannot release
    * it — only unpersisting the `LogicalRDD`-wrapped RDD does.
    * Iterative operators call this on superseded passes so a loop pins
    * at most two passes' blocks instead of all of them. */
  def releaseMaterialized(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

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
