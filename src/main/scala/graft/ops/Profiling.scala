package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Column-level data profiling: one row per profiled column with
  * row/null/distinct counts and min/max (rendered as strings so one
  * schema covers every column type).
  *
  * One aggregate pass computes every column's stats simultaneously;
  * the per-column rows come from a `stack` unpivot of that single
  * result row (internal aliases are index-based, so arbitrary column
  * names — spaces, dots, quotes — can be profiled). Numeric min/max
  * are rendered with an explicit fixed format (`%.6f`) because each
  * engine's native double-to-string formatter diverges at magnitude
  * ≥ 1e7 (scientific vs positional) — the explicit format is the
  * engine-stable contract the oracle mirrors with printf.
  *
  * `exact = true` uses count(DISTINCT) (Catalyst plans one Expand per
  * distinct aggregate — fine for a handful of columns, and required
  * for the cross-engine oracle); `exact = false` swaps in HyperLogLog
  * estimates, the 100 TB default where a ±2% distinct count is an
  * acceptable trade for removing the Expand entirely.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty)
    def render(c: String) = df.schema(c).dataType match {
      case _: NumericType => (x: org.apache.spark.sql.Column) =>
        format_string("%.6f", x.cast("double"))
      case _ => (x: org.apache.spark.sql.Column) => x.cast("string")
    }
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      val r = render(c)
      Seq(
        count(col(c)).as(s"nn_$i"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c), 0.02)).as(s"nd_$i"),
        r(min(col(c))).as(s"mn_$i"),
        r(max(col(c))).as(s"mx_$i"))
    }
    val wide = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackArgs = cols.zipWithIndex.map { case (c, i) =>
      s"'${c.replace("'", "''")}', n_rows - nn_$i, nd_$i, mn_$i, mx_$i"
    }.mkString(", ")
    wide.select(col("n_rows"),
      expr(s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_val, max_val)"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_val"), col("max_val"))
  }
}
