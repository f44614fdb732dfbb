package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to Spark 4's `private[sql]` Dataset↔LogicalPlan conversions
  * so the library can expose custom logical operators as `DataFrame`s
  * (classic execution mode). */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def plan(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}
