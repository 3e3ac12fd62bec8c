package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ⇄ Expression converters — the
  * standard pattern for third-party Catalyst extensions on Spark 4,
  * where `Column` no longer exposes its expression directly.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Imperative SQL-function registration on an EXISTING session —
    * what `graft.sql.GraftSql.register` goes through when the session
    * was not built with `spark.sql.extensions=graft.GraftExtensions`.
    * `sessionState` and the registries are `private[sql]`, hence the
    * bridge.
    */
  def registerSqlFunction(
      spark: SparkSession,
      ident: catalyst.FunctionIdentifier,
      info: catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(ident, info, builder)

  /** Table-valued-function registration (see [[registerSqlFunction]]). */
  def registerSqlTableFunction(
      spark: SparkSession,
      ident: catalyst.FunctionIdentifier,
      info: catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => catalyst.plans.logical.LogicalPlan): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.tableFunctionRegistry
      .registerFunction(ident, info, builder)

  /** The ANALYZED logical plan of a DataFrame — what a graft TVF
    * splices into the calling query (resolved like an expanded view).
    */
  def analyzedPlan(df: DataFrame): catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Deterministically free a localCheckpoint'ed DataFrame's blocks.
    * `Dataset.unpersist` is a no-op for checkpoint RDDs (they live at
    * the RDD level, not in the CacheManager); the backing RDD sits in
    * the plan's LogicalRDD leaf.
    */
  def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
    }
}
