package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-union analytics (gaps-and-islands): merge a group's
  * overlapping-or-touching [start, end] intervals into maximal
  * islands, and from them total covered time — active-time /
  * uptime / utilization accounting where naive `sum(end − start)`
  * double-counts every overlap.
  *
  * One window pass per group: an island starts exactly where a row's
  * start exceeds the running max of all PREVIOUS ends; the running
  * count of island-starts is the island id. One shuffle (the group
  * window); per-group work is a sort bounded by the largest group —
  * the tokenBudgetCap cost profile. No self-join (the naive
  * overlap-join is quadratic per group and skew-fatal for a busy
  * key).
  *
  * Semantics: closed intervals — touching intervals (a.end ==
  * b.start) merge; rows must satisfy end ≥ start. Deterministic for
  * any tie order: among equal starts, prior ends already reach the
  * shared start, so island membership is order-independent.
  */
object Intervals {

  /** Maximal merged islands per group: (group, island, start, end). */
  def islands(df: DataFrame, groupCol: String, startCol: String,
              endCol: String): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(startCol, endCol)
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val isNew = when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L)
    df.withColumn("_new", isNew)
      .withColumn("island",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(groupCol), col("island"))
      .agg(min(startCol).as("start"), max(endCol).as("end"))
  }

  /** Per-group union coverage: (group, n_islands, covered) where
    * covered = Σ island lengths — overlaps counted once.
    */
  def coverage(df: DataFrame, groupCol: String, startCol: String,
               endCol: String): DataFrame =
    islands(df, groupCol, startCol, endCol)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_islands"),
        sum(col("end") - col("start")).as("covered"))
}
