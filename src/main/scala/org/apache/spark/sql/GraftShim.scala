package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` surface for wrapping custom
  * Catalyst expressions as user-facing Columns (Spark 4 removed the
  * public `new Column(expr)` constructor) and registering SQL
  * functions on an existing session.
  */
object GraftShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Runtime registration on any session (the driver hands us ITS
    * session, so extension-based injection isn't available there).
    */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")

  /** Analyzed logical plan of a DataFrame (for building custom
    * logical nodes over existing frames).
    */
  def logicalPlan(df: Dataset[_]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** DataFrame from a custom logical plan. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Fork of the session with an isolated copy of the session state
    * (confs, temp views) sharing the same SparkContext. Lets a write
    * path pin a session conf (e.g. parquet output timestamp type)
    * without mutating — or racing — the caller's session.
    */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[classic.SparkSession].cloneSession()
}
