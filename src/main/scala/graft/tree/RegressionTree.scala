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
    val minVarianceReduction: Double = 1e-12) {

  private case class NodeStats(count: Long, mean: Double, variance: Double,
                               thresholds: Map[String, Double])

  def fit(dataset: DataFrame): FittedRegressionTree = {
    val work = dataset.select((featureColumns :+ targetColumn).distinct.map(col): _*)
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
    while (open.nonEmpty && depth < maxDepth) {
      val statAggs =
        count(lit(1)).as("n") +: avg(y).as("mean") +: var_pop(y).as("v") +:
        featureColumns.map(f => avg(col(f).cast("double")).as(s"thr_$f"))
      val stats = dataset.groupBy(nodeIdExpr(1L).as("node"))
        .agg(statAggs.head, statAggs.tail: _*)
        .collect()
        .map { r =>
          val thr = featureColumns.zipWithIndex.map { case (f, i) =>
            val v = r.get(4 + i)
            f -> (if (v == null) Double.NaN else v.asInstanceOf[Number].doubleValue())
          }.toMap
          r.getLong(0) -> NodeStats(r.getLong(1), r.getDouble(2),
            if (r.isNullAt(3)) 0.0 else r.getDouble(3), thr)
        }.toMap

      val openStats = open.flatMap(id => stats.get(id).map(id -> _))
      openStats.foreach { case (id, st) => means(id) = st.mean }
      val (toSplit, toLeaf) = openStats.partition { case (_, st) =>
        st.variance > 0.0 && st.count >= minSplitSamples
      }
      toLeaf.foreach { case (id, st) => leaves(id) = st.mean }
      open.filterNot(stats.contains).foreach(id => leaves(id) = 0.0)

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
            count(when(fc > t, lit(1))).as(s"rn_$f"))
        }
        val rows = dataset.select(col("*"), nodeIdExpr(1L).as("node"))
          .groupBy("node").agg(splitAggs.head, splitAggs.tail: _*)
          .collect().map(r => r.getLong(0) -> r).toMap

        val nextOpen = mutable.Buffer.empty[Long]
        toSplit.foreach { case (id, st) =>
          val row = rows(id)
          // weighted variance of a side from (sum, sumsq, n):
          // n·Var = sumsq − sum²/n  (0 for empty side)
          def sideCost(sumIdx: Int, sqIdx: Int, n: Long): Double =
            if (n == 0) 0.0
            else {
              val s = row.getDouble(sumIdx); val q = row.getDouble(sqIdx)
              q - s * s / n
            }
          val scored = featureColumns.sorted.map { f =>
            val i = featureColumns.indexOf(f)
            val base = 1 + 6 * i
            val ln = row.getLong(base + 2); val rn = row.getLong(base + 5)
            val cost =
              (if (ln == 0) 0.0 else sideCost(base, base + 1, ln)) +
              (if (rn == 0) 0.0 else sideCost(base + 3, base + 4, rn))
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
            nextOpen += 2 * id
            nextOpen += 2 * id + 1
          }
        }
        open = nextOpen.toSeq
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
