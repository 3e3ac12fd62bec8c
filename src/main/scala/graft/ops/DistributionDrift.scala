package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous-distribution drift statistics — the model-monitoring
  * companions to the categorical drift ops (`Snapshot.driftReport`'s
  * JS divergence, `q_source_kl`): has the DISTRIBUTION of a score or
  * feature moved between two samples (train vs serve, last week vs
  * this week)? Two standards, complementary:
  *
  *  - PSI (population stability index, the banking/monitoring
  *    convention): bin by the EXPECTED sample's deciles, compare bin
  *    shares; Σ(pₑ−pₐ)·ln(pₑ/pₐ). Rule of thumb: <0.1 stable,
  *    0.1–0.25 drifting, >0.25 act.
  *  - Exact two-sample Kolmogorov–Smirnov: max CDF gap, sensitive to
  *    ANY distributional change, no binning choices.
  *
  * Both are engine-deterministic by construction: decile edges come
  * from an (value, id)-total-ordered ntile (a tie can never straddle
  * an edge differently on two engines), bin counts and CDF steps are
  * integers, and the only doubles are final ratios of those integers.
  *
  * Scale: PSI is one sort of the expected sample for edges (the
  * exact-quantile cost the caller opted into), then one broadcast of
  * 9 edge values and a map-side-combined bin count per side. KS is
  * one aggregate to per-distinct-value counts, then windows over the
  * DISTINCT values (value-dictionary-sized, not row-sized).
  */
object DistributionDrift {

  /** Per-bin PSI table: (bin, n_expected, n_actual, p_expected,
    * p_actual, contrib, psi) — `psi` is the total, repeated per row
    * (10-row frame). Zero shares are floored at 1e-6 (the standard
    * convention — an empty bin otherwise makes the index infinite).
    */
  def psi(expected: DataFrame, actual: DataFrame, valueCol: String,
          idCol: String, nBins: Int = 10): DataFrame = {
    require(nBins >= 2, "need at least 2 bins")
    import org.apache.spark.sql.expressions.Window
    val e = expected.select(col(valueCol).as("v"), col(idCol).as("id"))
    val edges = e
      .withColumn("d", ntile(nBins).over(Window.orderBy("v", "id")))
      .groupBy("d").agg(max("v").as("edge"))
      .filter(col("d") < nBins)
      .agg(sort_array(collect_list("edge")).as("es"))
    def binned(df: DataFrame, n: String) = df
      .select(col(valueCol).as("v"))
      .crossJoin(broadcast(edges))
      .select((size(filter(col("es"), x => x < col("v"))) + 1).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(n))
    val floor = 1e-6
    binned(e.select(col("v").as(valueCol)), "n_expected")
      .join(binned(actual, "n_actual"), Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("n_expected"), lit(0L)).as("n_expected"),
        coalesce(col("n_actual"), lit(0L)).as("n_actual"))
      .withColumn("p_expected", greatest(
        col("n_expected").cast("double") /
          sum("n_expected").over(Window.partitionBy()), lit(floor)))
      .withColumn("p_actual", greatest(
        col("n_actual").cast("double") /
          sum("n_actual").over(Window.partitionBy()), lit(floor)))
      .withColumn("contrib", round((col("p_expected") - col("p_actual")) *
        log(col("p_expected") / col("p_actual")), 6))
      .withColumn("psi", round(sum((col("p_expected") - col("p_actual")) *
        log(col("p_expected") / col("p_actual")))
        .over(Window.partitionBy()), 6))
      .select(col("bin"), col("n_expected"), col("n_actual"),
        round(col("p_expected"), 6).as("p_expected"),
        round(col("p_actual"), 6).as("p_actual"),
        col("contrib"), col("psi"))
  }

  /** Exact two-sample KS statistic: one row
    * (ks, n_a, n_b) — max |F_a − F_b| over the pooled support, ties
    * handled exactly (the CDF steps past ALL duplicates of a value
    * before the gap is read).
    */
  def ksTest(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pooled = a.select(col(valueCol).as("v"), lit(1L).as("ca"), lit(0L).as("cb"))
      .unionAll(b.select(col(valueCol).as("v"), lit(0L).as("ca"), lit(1L).as("cb")))
      .groupBy("v").agg(sum("ca").as("ca"), sum("cb").as("cb"))
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pooled
      .withColumn("cum_a", sum("ca").over(w))
      .withColumn("cum_b", sum("cb").over(w))
      .withColumn("n_a", sum("ca").over(Window.partitionBy()))
      .withColumn("n_b", sum("cb").over(Window.partitionBy()))
      .agg(round(max(abs(col("cum_a").cast("double") / col("n_a") -
          col("cum_b").cast("double") / col("n_b"))), 6).as("ks"),
        first("n_a").as("n_a"), first("n_b").as("n_b"))
  }
}
