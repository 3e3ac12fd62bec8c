package graft.tree

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Random-forest ensemble over the level-wise distributed tree
  * learner — the quality-classifier shape training-data pipelines
  * actually deploy (bagged trees voting on document keep/drop).
  *
  * Determinism by construction (so fits are reproducible and
  * oracle-checkable):
  *  - row bagging hashes the FEATURE VALUES (xxhash64 seeded by the
  *    tree index) — stable under any partitioning, unlike
  *    monotonically_increasing_id;
  *  - feature bagging rotates a deterministic window over the
  *    feature list per tree.
  *
  * Prediction is majority vote: the sum of the per-tree codegen'd
  * when-chains compared to numTrees/2 — still ONE whole-stage-codegen
  * pass over the data, no shuffle.
  */
class RandomForest(
    val params: DecisionTreeParams,
    val numTrees: Int,
    val featureSubsetSize: Int = 0,
    val bagFraction: Double = 0.7,
    val seed: Long = 42L) {

  require(numTrees >= 1)

  private def featuresFor(tree: Int): Seq[String] = {
    val all = params.featureColumns
    val m = if (featureSubsetSize <= 0) all.size else math.min(featureSubsetSize, all.size)
    (0 until m).map(j => all(math.floorMod(tree + seed + j, all.size).toInt)).distinct
  }

  /** Deterministic per-tree row bag: hash of the feature values. */
  private def bagFilter(tree: Int): Column = {
    val h = xxhash64((lit(seed) +: lit(tree) +: params.featureColumns.map(col)): _*)
    pmod(h, lit(1000L)) < lit((bagFraction * 1000).toLong)
  }

  def fit(dataset: DataFrame): FittedRandomForest = {
    // ONE projected + cached base table for the whole ensemble; each
    // tree fits against a filtered view of it. (Fitting each tree via
    // DecisionTree.fit would re-read the source and materialize a
    // separate cache per tree — numTrees× the scan and memory cost.)
    val work = dataset.select(
      (params.featureColumns :+ params.classColumn).distinct.map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val trees = (0 until numTrees).map { i =>
        val treeParams = params.copy(featureColumns = featuresFor(i))
        new DecisionTree(treeParams).fitCached(work.filter(bagFilter(i)))
      }
      new FittedRandomForest(this, trees)
    } finally { work.unpersist(blocking = false); () }
  }
}

final class FittedRandomForest(
    val forest: RandomForest,
    val trees: Seq[FittedDecisionTree]) {

  /** Majority vote as a single codegen'd expression. */
  def predictionExpr: Column = {
    val votes = trees.map(_.root.predictionExpr.cast("int")).reduce(_ + _)
    (votes * 2 > trees.size).cast("int")
  }

  def transform(samples: DataFrame): DataFrame =
    samples.withColumn("prediction", predictionExpr)

  def toJValue: JValue = JObject(
    "num_trees" -> JInt(trees.size),
    "trees" -> JArray(trees.map(_.toJValue).toList))

  def json(indent: Option[Int] = None): String = indent match {
    case Some(_) => JsonMethods.pretty(JsonMethods.render(toJValue))
    case None    => JsonMethods.compact(JsonMethods.render(toJValue))
  }
}

object FittedRandomForest {
  def fromJson(s: String, forest: RandomForest): FittedRandomForest = {
    val JObject(fields) = JsonMethods.parse(s): @unchecked
    val JArray(treeJs) = fields.toMap.apply("trees"): @unchecked
    new FittedRandomForest(forest, treeJs.map(FittedDecisionTree.fromJValue))
  }
}
