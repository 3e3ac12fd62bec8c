package graft.tree

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Internals shared by the level-wise learners (DecisionTree,
  * RandomForest's fused fit, RegressionTree) so the reference
  * semantics — stopping rules, deterministic tie-breaks, per-level
  * threshold dispatch — exist in exactly one place. The fused forest
  * fit is documented to produce trees IDENTICAL to tree-at-a-time
  * fitting; sharing these is what keeps that invariant from drifting.
  */
private[tree] object FitInternals {

  /** Aggregate per-stage gain importances, weighted by each stage's
    * raw total gain (r12) — the boosters' cross-stage importance.
    */
  def aggregateImportances(ts: Seq[FittedRegressionTree]): Map[String, Double] = {
    val total = ts.map(_.totalGain).sum
    if (total <= 0.0) Map.empty
    else ts.flatMap(t => t.featureImportances.map {
        case (f, v) => f -> v * t.totalGain })
      .groupMapReduce(_._1)(_._2)(_ + _)
      .map { case (f, g) => f -> g / total }
  }

  /** Safety cap for maxDepth = -1. */
  val MaxLevels = 64

  /** Right-size a fit working set's partitioning for REPEATED scans.
    * The level-wise fit reads its cached working set once per level
    * (plus prediction passes): if the upstream plan yields fewer
    * partitions than the cluster's parallelism — a small file, a
    * single parquet row group, a collapsed shuffle — every one of
    * those scans runs on a fraction of the cores. Pay ONE shuffle up
    * front so each repeated scan uses the full cluster; at corpus
    * scale the source partition count is far above
    * defaultParallelism and this is the identity (it never coalesces
    * — only widens). The partition count is read off the STATIC
    * physical plan (`sparkPlan`, lazy RDD construction) because
    * executing the adaptive plan's RDD would materialize its query
    * stages just to count partitions; if the probe fails for any
    * reason the working set is left as-is.
    */
  private[tree] def rightSizeForRepeatedScans(
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    val parts =
      try df.queryExecution.sparkPlan.execute().getNumPartitions
      catch { case scala.util.control.NonFatal(_) => par }
    if (parts < par) df.repartition(par) else df
  }

  /** Deepest level that uses the O(1) literal-array threshold lookup;
    * past it (2^depth literals per feature would bloat the plan, and
    * level indices overflow Int past 2^31) the when-chain fallback is
    * used — at such depths only a handful of nodes stay open, so the
    * chain stays short.
    */
  val MaxArrayLookupDepth = 12

  /** Cap on total literal-array entries (numTrees · 2^depth) for the
    * forest variant's dense-array path — keeps plan size bounded for
    * wide forests, not just deep ones.
    */
  val MaxForestArrayEntries = 4096L

  /** `count` is a Double: the weighted fit's node mass is sum(w)
    * (fractional for soft-dedup 1/n weights); unweighted fits pass
    * exact whole-number doubles (< 2^53), so comparisons and
    * stopping rules are unchanged.
    */
  final case class NodeStats(count: Double, p1: Double, thresholds: Map[String, Double]) {
    def entropy: Double = EntropySplitMetric.evalFromP1(p1)
    def majority: Int = if (p1 >= 0.5) 1 else 0
  }

  /** Reference stopping rule (dtree.py:216-225): split unless pure,
    * below the entropy/count floors, or at max depth. The stopping
    * entropy is ALWAYS the entropy metric, even when splitting on
    * gini (dtree.py:211-213).
    */
  def shouldSplit(st: NodeStats, params: DecisionTreeParams, depth: Int): Boolean =
    st.entropy != 0.0 &&
      st.entropy >= params.minSplitEntropy &&
      st.count >= params.minSplitSamples &&
      depth != params.maxDepth

  /** Deterministic best-feature pick: (metric asc|desc, name asc) —
    * the same tie-break as Splitting.computeAllSplits. Tuples are
    * (feature, threshold, leftN, rightN, metricValue).
    */
  def pickBest(
      scored: Seq[(String, Double, Long, Long, Double)],
      metric: SplitMetric): (String, Double, Long, Long, Double) =
    if (metric.seekMinimum) scored.minBy(t => (t._5, t._1))
    else scored.minBy(t => (-t._5, t._1))

  /** Per-level candidate-threshold expression keyed on the `node`
    * column: O(1) constant-folded dense-array lookup while the level
    * is shallow (2^depth literals is cheap), and a constant-folded
    * MAP lookup past MaxArrayLookupDepth — the map holds one entry
    * per OPEN node, stays flat no matter how bushy the level is (a
    * nested when-chain per node would stack-overflow Catalyst's
    * recursive transforms on a bushy deep level), and misses return
    * null → NaN (rows routed to leaves closed at shallower levels
    * match no side).
    */
  def levelThresholdExpr(entries: Seq[(Long, Double)], depth: Int): Column = {
    val levelBase = 1L << depth
    if (depth <= MaxArrayLookupDepth) {
      val width = 1 << depth
      val vals = Array.fill(width)(Double.NaN)
      entries.foreach { case (id, t) => vals((id - levelBase).toInt) = t }
      when(col("node") >= lit(levelBase),
        element_at(array(vals.map(v => lit(v)).toIndexedSeq: _*),
          (col("node") - levelBase + 1).cast("int")))
        .otherwise(lit(Double.NaN))
    } else {
      val kvs = entries.flatMap { case (id, t) => Seq(lit(id), lit(t)) }
      coalesce(element_at(map(kvs.toIndexedSeq: _*), col("node")), lit(Double.NaN))
    }
  }

  /** Forest variant keyed on (`t`, `node`); the deep-level map key is
    * the string "t_node" (immune to id arithmetic overflow at any
    * depth).
    */
  def levelThresholdExprForest(
      entries: Seq[(Int, Long, Double)], depth: Int, numTrees: Int): Column = {
    val levelBase = 1L << depth
    // the array path emits numTrees · 2^depth literals (× 4 aggregate
    // expressions downstream) — gate on the PRODUCT, not depth alone,
    // or a 100-tree forest at depth 12 emits ~400k literals per
    // feature and blows codegen / the constant pool
    if (depth <= MaxArrayLookupDepth &&
        numTrees.toLong * (1L << depth) <= MaxForestArrayEntries) {
      val width = 1 << depth
      val vals = Array.fill(numTrees * width)(Double.NaN)
      entries.foreach { case (i, id, t) => vals(i * width + (id - levelBase).toInt) = t }
      when(col("node") >= lit(levelBase),
        element_at(array(vals.map(v => lit(v)).toIndexedSeq: _*),
          (col("t") * width + (col("node") - levelBase) + 1).cast("int")))
        .otherwise(lit(Double.NaN))
    } else {
      val kvs = entries.flatMap { case (i, id, t) => Seq(lit(s"${i}_$id"), lit(t)) }
      coalesce(
        element_at(map(kvs.toIndexedSeq: _*),
          concat_ws("_", col("t"), col("node"))),
        lit(Double.NaN))
    }
  }
}
