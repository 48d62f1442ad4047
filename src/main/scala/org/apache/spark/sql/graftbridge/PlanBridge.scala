package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession, classic}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy

/** Bridge into `private[sql]` plan construction — how a library turns a
  * hand-built `LogicalPlan` (e.g. the graft as-of join node) into a
  * user-facing DataFrame and registers the strategy that plans it.
  */
object PlanBridge {

  /** Wrap a logical plan as a DataFrame (re-runs analysis + optimization). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan backing a DataFrame. */
  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** Idempotently add a planner strategy to a running session. The
    * config-time route is `spark.sql.extensions=graft.plans.GraftExtensions`;
    * this is the runtime route for sessions built without it.
    */
  def addStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(s)) {
      exp.extraStrategies = exp.extraStrategies :+ s
    }
  }
}
