package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** Minimal access bridge into `private[sql]` Spark internals.
  *
  * Spark deliberately keeps `Dataset.ofRows` (build a DataFrame from a
  * LogicalPlan) package-private; extension libraries that add custom
  * logical operators conventionally reach it through a one-object file in
  * the `org.apache.spark.sql` package (the same technique Spark's own
  * test kit and the well-known OSS extension libraries use). Everything
  * here delegates — no behavior lives in this file.
  */
object GraftSqlBridge {

  /** Wrap an (already resolved) logical plan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** The analyzed plan of a DataFrame (resolved attributes). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[ClassicDataset[Row]].queryExecution.analyzed

  /** Wrap a Catalyst expression as a Column (the session-free bridge
    * `functions.expr` cannot provide for expressions with Column
    * children). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** The Catalyst expression behind a Column (inverse of [[column]]). */
  def expression(c: Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
