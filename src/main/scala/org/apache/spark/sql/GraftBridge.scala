package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversions.
  *
  * Spark 4 split Column into an API facade backed by ColumnNodes; the only
  * supported conversion lives in `classic.ExpressionUtils`, which is
  * `private[sql]`. This object re-exports the two conversions graft needs to
  * attach custom Catalyst expressions (e.g. FloatVectorDot) to DataFrame
  * code. Kept deliberately minimal.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a hand-built LogicalPlan as a DataFrame (`classic.Dataset.ofRows`
    * is `private[sql]`) — the entry point for graft's custom logical
    * operators (e.g. the native as-of join). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed LogicalPlan of a DataFrame, for embedding as a child of
    * a custom logical node. */
  def analyzed(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Introspection over `private[sql]` SparkSessionExtensions builders —
    * lets GraftExtensionsSpec assert the strategy/rule injections without
    * booting a second SparkContext with spark.sql.extensions set. */
  def plannerStrategies(
      ext: SparkSessionExtensions, spark: SparkSession): Seq[Any] =
    ext.buildPlannerStrategies(spark.asInstanceOf[classic.SparkSession])
  def optimizerRules(
      ext: SparkSessionExtensions, spark: SparkSession): Seq[Any] =
    ext.buildOptimizerRules(spark.asInstanceOf[classic.SparkSession])
}
