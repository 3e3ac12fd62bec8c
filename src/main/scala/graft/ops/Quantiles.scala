package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT grouped quantiles as a sort, not a buffering aggregate.
  *
  * Spark's built-in exact `percentile` is a TypedImperativeAggregate
  * that buffers every (value → count) pair per group in an in-memory
  * map on a single task per group — interpreted (never codegen'd),
  * allocation-heavy, and at scale the same single-reducer posting
  * list problem as any per-key collect. This form instead rides
  * Spark's distributed sort machinery, which is exactly what Tungsten
  * is good at:
  *
  *   1. one exchange + sort by (group, value) — `row_number` and the
  *      per-group count ride the SAME exchange (the count window's
  *      partition-only requirement is satisfied by the sort order, so
  *      EnsureRequirements inserts no second exchange);
  *   2. keep ONLY the ≤ 2·|ps| boundary rows per group (floor/ceil of
  *      each target position) — everything else is filtered before
  *      the final tiny aggregate;
  *   3. per group, interpolate `lo + frac·(hi − lo)` — bit-for-bit
  *      the continuous-quantile formula DuckDB (`quantile_cont`) and
  *      Spark (`percentile`) both apply, so results are oracle-stable
  *      against either.
  *
  * Nulls are dropped (matching both engines' aggregate semantics);
  * a group whose values are all null simply does not appear.
  */
object Quantiles {

  /** One row per group: `groupCol`, then one double column per
    * requested quantile, named by `names` (defaults `p25`-style from
    * the fraction).
    */
  def exactQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                     ps: Seq[Double], names: Seq[String] = Nil): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0))
    val colNames =
      if (names.nonEmpty) { require(names.size == ps.size); names }
      else ps.map(p => "p" + math.round(p * 100).toString)
    val g = col(groupCol)
    val v = col(valueCol).cast("double")
    val ranked = df.select(g.as("_g"), v.as("_v")).filter(col("_v").isNotNull)
      .withColumn("_rn",
        row_number().over(Window.partitionBy("_g").orderBy("_v")) - 1)
      .withColumn("_n", count(lit(1)).over(Window.partitionBy("_g")))
    // a row survives iff it is the floor or ceil row of SOME target
    def pos(p: Double): Column = lit(p) * (col("_n") - 1)
    val needed = ps.map(p =>
      col("_rn") === floor(pos(p)) || col("_rn") === ceil(pos(p)))
      .reduce(_ || _)
    val boundary = ranked.filter(needed)
    val aggs = ps.zipWithIndex.flatMap { case (p, i) =>
      Seq(
        max(when(col("_rn") === floor(pos(p)), col("_v"))).as(s"_lo_$i"),
        max(when(col("_rn") === ceil(pos(p)), col("_v"))).as(s"_hi_$i"))
    }
    val frs = ps.zipWithIndex.map { case (p, i) =>
      max(pos(p) - floor(pos(p))).as(s"_f_$i")
    }
    val out = boundary.groupBy(col("_g").as(groupCol))
      .agg((aggs ++ frs).head, (aggs ++ frs).tail: _*)
    val quantCols = ps.indices.map { i =>
      (col(s"_lo_$i") + col(s"_f_$i") * (col(s"_hi_$i") - col(s"_lo_$i")))
        .as(colNames(i))
    }
    out.select(col(groupCol) +: quantCols: _*)
  }

  /** EXACT grouped WEIGHTED quantiles: per group and per target p,
    * the smallest value whose cumulative weight reaches p·W (the
    * type-1 / lower weighted quantile — no interpolation, so the
    * answer is a value actually present and exactly reproducible
    * cross-engine). Spark has no weighted percentile at all (the
    * built-in `percentile` takes an integer frequency, buffered
    * per-group in memory); this rides the same distributed-sort
    * machinery as [[exactQuantiles]]: ONE exchange + sort by
    * (group, value, tie-break), running weight and group total ride
    * the SAME sort, and only each target's crossing row (the first
    * with cumw ≥ p·W) survives to a tiny final aggregate.
    *
    * The tie-break column pins a TOTAL order so every engine
    * accumulates the same running weights — with it, the result is
    * deterministic even for float weights; integer weights (e.g.
    * token counts) make the comparison arithmetic itself exact.
    * Rows with null value or weight ≤ 0 are dropped.
    */
  def weightedQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                        weightCol: String, tieCol: String,
                        ps: Seq[Double],
                        names: Seq[String] = Nil): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0))
    val colNames =
      if (names.nonEmpty) { require(names.size == ps.size); names }
      else ps.map(p => "wp" + math.round(p * 100).toString)
    val w = Window.partitionBy("_g").orderBy(col("_v"), col("_t"))
    val ranked = df
      .select(col(groupCol).as("_g"), col(valueCol).cast("double").as("_v"),
        col(weightCol).cast("double").as("_w"), col(tieCol).as("_t"))
      .filter(col("_v").isNotNull && col("_w") > 0)
      .withColumn("_cw",
        sum(col("_w")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("_tw", sum(col("_w")).over(Window.partitionBy("_g")))
    def crossing(p: Double) =
      col("_cw") >= lit(p) * col("_tw") &&
        col("_cw") - col("_w") < lit(p) * col("_tw")
    val boundary = ranked.filter(ps.map(crossing).reduce(_ || _))
    val aggs = ps.zipWithIndex.map { case (p, i) =>
      min(when(crossing(p), col("_v"))).as(colNames(i))
    }
    boundary.groupBy(col("_g").as(groupCol)).agg(aggs.head, aggs.tail: _*)
  }
}
