package graft.tree

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Regression-tree node: mean-valued leaves. Shares the codegen
  * philosophy of the classifier (TreeNode.scala): the fitted tree is
  * ONE nested `when` expression.
  */
sealed trait RegTreeNode {
  def predictionExpr: Column

  /** The tree as portable SQL (leaf literals cast to DOUBLE so engines
    * whose bare numeric literals are DECIMAL — DuckDB — keep double
    * arithmetic). Lets any engine serve the fitted model, and lets the
    * correctness harness regenerate the oracle from the model fitted
    * AT THE GATE SCALE FACTOR instead of pinning one SF's constants.
    */
  def caseSql: String
}
final case class RegLeaf(value: Double) extends RegTreeNode {
  def predictionExpr: Column = lit(value)
  def caseSql: String = s"($value)::DOUBLE"
}
final case class RegSplit(attribute: String, threshold: Double,
                          left: RegTreeNode, right: RegTreeNode) extends RegTreeNode {
  def predictionExpr: Column =
    when(col(attribute) <= lit(threshold), left.predictionExpr)
      .otherwise(right.predictionExpr)
  def caseSql: String =
    s"(CASE WHEN $attribute <= $threshold THEN ${left.caseSql} ELSE ${right.caseSql} END)"
}

final class FittedRegressionTree(val root: RegTreeNode) {
  def transform(df: DataFrame): DataFrame =
    df.withColumn("prediction", root.predictionExpr)

  /** Portable SQL of the fitted tree (cf. RegTreeNode.caseSql). */
  def caseSql: String = root.caseSql
}

/** Distributed regression tree: variance-reduction splits, mean
  * leaves. Same level-wise machinery as the classifier
  * (DecisionTree.scala): per level, one aggregate pass computes each
  * open node's count/mean/threshold, a second computes per-(node,
  * feature) left/right sum, sum-of-squares and count — from which the
  * weighted variance of every candidate split falls out without
  * another scan. Driver state stays O(nodes × features).
  */
class RegressionTree(
    val featureColumns: Seq[String],
    val targetColumn: String,
    val maxDepth: Int = 5,
    val minSplitSamples: Long = 2L,
    val minVarianceReduction: Double = 1e-12,
    val gradientWeightedThresholds: Boolean = false) {

  private case class NodeStats(count: Long, mean: Double, variance: Double,
                               thresholds: Map[String, Double])

  def fit(dataset: DataFrame): FittedRegressionTree = {
    val work = FitInternals.rightSizeForRepeatedScans(
      dataset.select((featureColumns :+ targetColumn).distinct.map(col): _*))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try fitOn(work)
    finally { work.unpersist(blocking = false); () }
  }

  /** Fit on an already-prepared working set (cf. DecisionTree.fitCached). */
  private[tree] def fitCached(dataset: DataFrame): FittedRegressionTree =
    fitOn(dataset)

  private def fitOn(dataset: DataFrame): FittedRegressionTree = {
    val y = col(targetColumn).cast("double")
    val splits = mutable.Map.empty[Long, SplitParams]
    val leaves = mutable.Map.empty[Long, Double]
    val means = mutable.Map.empty[Long, Double]

    def nodeIdExpr(id: Long): Column = splits.get(id) match {
      case Some(s) =>
        when(col(s.attribute) <= lit(s.threshold), nodeIdExpr(2 * id))
          .otherwise(nodeIdExpr(2 * id + 1))
      case None => lit(id)
    }

    var open: Seq[Long] = Seq(1L)
    var depth = 0

    def numOr(v: Any, dflt: Double): Double =
      if (v == null) dflt else v.asInstanceOf[Number].doubleValue()

    // Candidate-threshold aggregate for feature g over the rows where
    // `cond` holds. Plain mode: the side's feature mean — thresholds
    // depend on FEATURES ONLY, so repeated fits over the same rows
    // explore one fixed lattice (fine for a standalone tree; it is
    // what makes the fit SQL-oracle-able from rendered constants).
    // Gradient-weighted mode (boosting stages, where y IS the current
    // residual): the |y|-weighted feature mean — thresholds
    // concentrate where the ensemble is currently WRONG, so each
    // stage can refine the partition instead of re-deriving it (the
    // large-gradient focus of LightGBM's GOSS, as a threshold choice
    // instead of a sampling step). Falls back to the plain mean when
    // the side's residuals are all zero; the division is guarded (a
    // zero weight sum would THROW under ANSI mode, not yield null).
    def thrAggOver(g: String, cond: Option[Column], name: String): Column = {
      val gc = col(g).cast("double")
      def over(e: Column): Column = cond.map(c => when(c, e)).getOrElse(e)
      if (!gradientWeightedThresholds) avg(over(gc)).as(name)
      else {
        val w = abs(y)
        val ws = sum(over(w))
        when(ws > 0.0, sum(over(w * gc)) / ws)
          .otherwise(avg(over(gc))).as(name)
      }
    }

    // ROOT stats — the only dedicated stats pass (cf.
    // DecisionTree.fitOn): each deeper node's (count, mean, variance,
    // thresholds) are computed inside its parent's fused split
    // aggregate, so a fit of depth d runs d+1 jobs instead of 2d.
    val rootAggs =
      count(lit(1)).as("n") +: avg(y).as("mean") +: var_pop(y).as("v") +:
      featureColumns.map(f => thrAggOver(f, None, s"thr_$f"))
    val rootRow = dataset.agg(rootAggs.head, rootAggs.tail: _*).collect()(0)
    var openStats: Map[Long, NodeStats] =
      if (rootRow.getLong(0) == 0L) Map.empty
      else Map(1L -> NodeStats(rootRow.getLong(0), rootRow.getDouble(1),
        if (rootRow.isNullAt(2)) 0.0 else rootRow.getDouble(2),
        featureColumns.zipWithIndex.map { case (f, i) =>
          f -> numOr(rootRow.get(3 + i), Double.NaN)
        }.toMap))

    while (open.nonEmpty && depth < maxDepth) {
      val present = open.flatMap(id => openStats.get(id).map(id -> _))
      present.foreach { case (id, st) => means(id) = st.mean }
      val (toSplit, toLeaf) = present.partition { case (_, st) =>
        st.variance > 0.0 && st.count >= minSplitSamples
      }
      toLeaf.foreach { case (id, st) => leaves(id) = st.mean }
      open.filterNot(openStats.contains).foreach(id => leaves(id) = 0.0)

      if (toSplit.nonEmpty) {
        // per-node threshold dispatch (see FitInternals.levelThresholdExpr)
        def thrExpr(f: String): Column =
          FitInternals.levelThresholdExpr(
            toSplit.map { case (id, st) => id -> st.thresholds(f) }, depth)
        val splitAggs = featureColumns.flatMap { f =>
          val fc = col(f).cast("double")
          val t = thrExpr(f)
          Seq(
            sum(when(fc <= t, y)).as(s"ls_$f"),
            sum(when(fc <= t, y * y)).as(s"lq_$f"),
            count(when(fc <= t, lit(1))).as(s"ln_$f"),
            sum(when(fc > t, y)).as(s"rs_$f"),
            sum(when(fc > t, y * y)).as(s"rq_$f"),
            count(when(fc > t, lit(1))).as(s"rn_$f")) ++
          featureColumns.flatMap { g =>
            Seq(
              thrAggOver(g, Some(fc <= t), s"cthl_${f}__$g"),
              thrAggOver(g, Some(fc > t), s"cthr_${f}__$g"))
          }
        }
        val rows = dataset.select(col("*"), nodeIdExpr(1L).as("node"))
          .groupBy("node").agg(splitAggs.head, splitAggs.tail: _*)
          .collect().map(r => r.getLong(0) -> r).toMap

        val nextOpen = mutable.Buffer.empty[Long]
        val nextStats = Map.newBuilder[Long, NodeStats]
        toSplit.foreach { case (id, st) =>
          val row = rows(id)
          def cellD(nm: String): Double = row.getDouble(row.fieldIndex(nm))
          def cellL(nm: String): Long = row.getLong(row.fieldIndex(nm))
          // weighted variance of a side from (sum, sumsq, n):
          // n·Var = sumsq − sum²/n  (0 for empty side)
          def sideCost(s: Double, q: Double, n: Long): Double = q - s * s / n
          val scored = featureColumns.sorted.map { f =>
            val ln = cellL(s"ln_$f"); val rn = cellL(s"rn_$f")
            val cost =
              (if (ln == 0) 0.0
               else sideCost(cellD(s"ls_$f"), cellD(s"lq_$f"), ln)) +
              (if (rn == 0) 0.0
               else sideCost(cellD(s"rs_$f"), cellD(s"rq_$f"), rn))
            (f, st.thresholds(f), ln, rn, cost)
          }
          val best = scored.minBy(t => (t._5, t._1))
          val (bf, bt, ln, rn, bestCost) = best
          val parentCost = st.variance * st.count
          // relative floor: at large target magnitudes, fp noise in the
          // sum/sumsq aggregates easily exceeds any absolute epsilon,
          // producing "splits" whose children share one mean
          if (math.min(ln, rn) == 0L || bt.isNaN ||
              parentCost - bestCost <
                math.max(minVarianceReduction, 1e-9 * parentCost)) {
            leaves(id) = st.mean
          } else {
            splits(id) = SplitParams(bf, bt)
            // child stats from the SAME row: mean = s/n, variance =
            // (q − s²/n)/n clamped at 0 (the sum/sumsq form can dip an
            // ULP negative on a constant-target side; the relative
            // floor above already guards the split decision itself)
            def childStats(n: Long, sNm: String, qNm: String,
                           pfx: String): NodeStats = {
              val s = cellD(sNm); val q = cellD(qNm)
              NodeStats(n, s / n, math.max(0.0, (q - s * s / n) / n),
                featureColumns.map(g =>
                  g -> numOr(row.get(row.fieldIndex(s"$pfx${bf}__$g")),
                    Double.NaN)).toMap)
            }
            nextStats += (2 * id) -> childStats(ln, s"ls_$bf", s"lq_$bf", "cthl_")
            nextStats += (2 * id + 1) -> childStats(rn, s"rs_$bf", s"rq_$bf", "cthr_")
            nextOpen += 2 * id
            nextOpen += 2 * id + 1
          }
        }
        open = nextOpen.toSeq
        openStats = nextStats.result()
      } else open = Seq.empty
      depth += 1
    }
    open.foreach(id => leaves(id) = means.getOrElse(id, {
      var cur = id
      while (cur >= 1 && !means.contains(cur)) cur /= 2
      means.getOrElse(cur, 0.0)
    }))

    def build(id: Long): RegTreeNode = splits.get(id) match {
      case Some(s) => RegSplit(s.attribute, s.threshold, build(2 * id), build(2 * id + 1))
      case None => RegLeaf(leaves.getOrElse(id, means.getOrElse(id, 0.0)))
    }
    new FittedRegressionTree(build(1L))
  }
}
