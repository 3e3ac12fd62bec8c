package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ⇄ Expression converters — the
  * standard pattern for third-party Catalyst extensions on Spark 4,
  * where `Column` no longer exposes its expression directly.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

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
