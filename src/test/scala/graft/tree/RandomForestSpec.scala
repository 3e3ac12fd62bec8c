package graft.tree

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RandomForestSpec extends SparkSpec {

  lazy val labeled = graft.Tables.labeledLineitem(spark, "/root/testdata/sf0.001")

  test("forest fit is deterministic") {
    val params = DecisionTreeParams(Seq("l_discount", "l_quantity", "l_tax"),
      "class", "mean", "entropy", maxDepth = 2)
    val f1 = new RandomForest(params, numTrees = 3).fit(labeled)
    val f2 = new RandomForest(params, numTrees = 3).fit(labeled)
    assert(f1.toJValue == f2.toJValue)
  }

  test("forest learns the feature-derived label and beats a stump") {
    val params = DecisionTreeParams(Seq("l_discount", "l_quantity", "l_tax"),
      "class", "mean", "entropy", maxDepth = 3)
    val forest = new RandomForest(params, numTrees = 5).fit(labeled)
    val out = forest.transform(labeled)
    val acc = out.filter(col("class") === col("prediction")).count().toDouble / out.count()
    assert(acc > 0.95, s"forest accuracy $acc")
    val stump = new DecisionTree(params.copy(maxDepth = 0)).fit(labeled)
    val stumpAcc = stump.transform(labeled)
      .filter(col("class") === col("prediction")).count().toDouble / out.count()
    assert(acc > stumpAcc)
  }

  test("vote is a majority: unanimous leaves dominate") {
    val params = DecisionTreeParams(Seq("l_quantity"), "class", "mean", "entropy",
      maxDepth = 1)
    val forest = new RandomForest(params, numTrees = 3).fit(labeled)
    val preds = forest.transform(labeled).select("prediction").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(preds.subsetOf(Set(0, 1)))
  }

  test("forest json round-trips") {
    val params = DecisionTreeParams(Seq("l_discount", "l_quantity"),
      "class", "mean", "entropy", maxDepth = 2)
    val rf = new RandomForest(params, numTrees = 3)
    val fitted = rf.fit(labeled)
    val loaded = FittedRandomForest.fromJson(fitted.json(), rf)
    assert(loaded.toJValue == fitted.toJValue)
    val a = fitted.transform(labeled).select("prediction").collect().map(_.getInt(0)).toSeq
    val b = loaded.transform(labeled).select("prediction").collect().map(_.getInt(0)).toSeq
    assert(a == b)
  }

  test("fused level-wise fit produces trees identical to the sequential fit") {
    val labeled = graft.Tables.labeledLineitem(spark, "/root/testdata/sf0.001")
    val params = DecisionTreeParams(
      Seq("l_discount", "l_quantity", "l_tax"), "class", "mean", "entropy", maxDepth = 3)
    val forest = new RandomForest(params, numTrees = 3)
    val fused = forest.fit(labeled)
    val sequential = forest.fitSequential(labeled)
    assert(fused.trees.size == sequential.trees.size)
    fused.trees.zip(sequential.trees).foreach { case (f, s) =>
      assert(f.json() == s.json())
    }
  }
}
