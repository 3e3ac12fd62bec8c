package graft.tree

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gain-based feature importances (r12): each feature's share of the
  * fit's total impurity/SSE decrease — the standard diagnostic for
  * "what did the distiller actually learn from" (split-COUNT
  * importance, the binary tree's original, over-credits shallow
  * cosmetic splits; gain weights by how much each split helped).
  */
class GainImportanceSpec extends SparkSpec {
  import spark.implicits._

  test("regression tree: the informative feature takes ~all the gain") {
    val rows = for (x <- 1 to 40; z <- Seq(0.0, 1.0))
      yield (x.toDouble, z, if (x <= 20) 0.0 else 100.0)
    val df = rows.toDF("x", "noise", "y")
    val fitted = new RegressionTree(Seq("x", "noise"), "y", maxDepth = 4).fit(df)
    val imp = fitted.featureImportances
    assert(math.abs(imp.values.sum - 1.0) < 1e-12)
    assert(imp("x") > 0.95, imp.toString)
    assert(fitted.totalGain > 0.0)
  }

  test("k-ary tree: categorical columns earn gain shares too") {
    val rows = for {
      lang <- Seq("en", "de", "fr", "zh"); rep <- 1 to 5
    } yield (lang, (rep % 3).toDouble,
      if (lang == "en" || lang == "de") 0 else 1)
    val df = rows.toDF("lang", "z", "class")
    val p = DecisionTreeParams(Seq("z"), "class", "mean", "gini", maxDepth = 3)
    val fitted = new MulticlassDecisionTree(p,
      categoricalColumns = Seq("lang")).fit(df)
    val imp = fitted.featureImportances
    assert(math.abs(imp.values.sum - 1.0) < 1e-12)
    assert(imp.getOrElse("lang", 0.0) > 0.95, imp.toString)
  }

  test("boosters aggregate stage gains; importances sum to 1") {
    val df = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .withColumn("class",
        ((col("l_quantity") + col("l_discount") * 600.0) > 40.0).cast("int"))
    val gbt = new GradientBoostingClassifier(
      Seq("l_quantity", "l_discount", "l_tax"), "class",
      numStages = 4, learningRate = 0.5, maxDepth = 2).fit(df)
    val imp = gbt.featureImportances
    assert(math.abs(imp.values.sum - 1.0) < 1e-9, imp.toString)
    // the two boundary features carry the signal; tax is noise
    assert(imp.getOrElse("l_quantity", 0.0) +
      imp.getOrElse("l_discount", 0.0) > 0.9, imp.toString)
  }

  test("pure-leaf fit yields empty importances") {
    val df = Seq((1.0, 5.0), (2.0, 5.0)).toDF("x", "y")
    val fitted = new RegressionTree(Seq("x"), "y").fit(df)
    assert(fitted.featureImportances.isEmpty && fitted.totalGain == 0.0)
  }
}
