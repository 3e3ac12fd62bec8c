package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling: one row per profiled column with
  * row/null/distinct counts and min/max (rendered as strings so one
  * schema covers every column type).
  *
  * One aggregate pass computes every column's stats simultaneously;
  * the per-column rows come from a `stack` unpivot of that single
  * result row. `exact = true` uses count(DISTINCT) (Catalyst plans
  * one Expand per distinct aggregate — fine for a handful of columns,
  * and required for the cross-engine oracle); `exact = false` swaps
  * in HyperLogLog estimates, the 100 TB default where a ±2% distinct
  * count is an acceptable trade for removing the Expand entirely.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty)
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"nn_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c), 0.02)).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"))
    }
    val wide = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackArgs = cols.map(c =>
      s"'$c', n_rows - nn_$c, nd_$c, mn_$c, mx_$c").mkString(", ")
    wide.select(col("n_rows"),
      expr(s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_val, max_val)"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_val"), col("max_val"))
  }
}
