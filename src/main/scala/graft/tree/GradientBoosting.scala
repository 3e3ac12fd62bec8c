package graft.tree

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gradient-boosted regression trees (squared loss).
  *
  * Boosting for L2 loss is residual fitting: stage m trains a
  * regression tree on `y − F_{m−1}(x)` and the model adds
  * `lr · tree_m(x)`. Because every fitted tree is a pure Column
  * expression, the residual target of each stage is ALSO a pure
  * expression over the raw data — no per-stage materialization, no
  * extra table: stage m's fit scans the original data with the
  * residual computed on the fly inside the aggregates. The final
  * model is one codegen'd expression (base + Σ lr·tree_m).
  */
class GradientBoosting(
    val featureColumns: Seq[String],
    val targetColumn: String,
    val numStages: Int = 3,
    val learningRate: Double = 0.5,
    val maxDepth: Int = 3) {

  require(numStages >= 1 && learningRate > 0)

  def fit(dataset: DataFrame): FittedGBT = {
    val y = col(targetColumn).cast("double")
    // ONE projected + cached base table for all stages; the residual
    // is an expression over it, computed on the fly inside each
    // stage's aggregates (a per-stage fit would re-read the source
    // and materialize a fresh cache per stage).
    val work = FitInternals.rightSizeForRepeatedScans(
      dataset.select((featureColumns :+ targetColumn).distinct.map(col): _*))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val base = work.agg(avg(y)).head().getDouble(0)
      var modelExpr: Column = lit(base)
      val trees = (0 until numStages).map { _ =>
        val residualCol = "__residual"
        val withResidual = work.withColumn(residualCol, y - modelExpr)
        val tree = new RegressionTree(featureColumns, residualCol,
          maxDepth = maxDepth).fitCached(withResidual)
        modelExpr = modelExpr + lit(learningRate) * tree.root.predictionExpr
        tree
      }
      new FittedGBT(base, learningRate, trees.map(_.root))
    } finally { work.unpersist(blocking = false); () }
  }
}

final class FittedGBT(
    val basePrediction: Double,
    val learningRate: Double,
    val stages: Seq[RegTreeNode]) {

  /** The whole ensemble as one codegen'd expression. */
  def predictionExpr: Column =
    stages.foldLeft(lit(basePrediction): Column)(
      (acc, t) => acc + lit(learningRate) * t.predictionExpr)

  def transform(df: DataFrame): DataFrame =
    df.withColumn("prediction", predictionExpr)

  /** The whole ensemble as portable SQL: base + Σ lr·tree_m (cf.
    * RegTreeNode.caseSql — lets the harness regenerate the oracle
    * from the model fitted at the gate scale factor).
    */
  def modelSql: String =
    stages.map(t => s" + $learningRate * ${t.caseSql}")
      .mkString(s"(($basePrediction)::DOUBLE", "", ")")
}
