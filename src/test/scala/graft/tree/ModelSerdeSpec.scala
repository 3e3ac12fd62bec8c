package graft.tree

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JSON serde round-trips for the regression/boosting family (r12) —
  * completes the train-once/serve-anywhere lifecycle the binary tree
  * already had (reference-format serde): every fitted model must
  * reload to a STRUCTURALLY EQUAL model (case-class equality ⇒ same
  * predictionExpr, same rendered SQL).
  */
class ModelSerdeSpec extends SparkSpec {
  import spark.implicits._

  private def df = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    .withColumn("y", col("l_quantity") * 10.0 +
      when(col("l_discount") > 0.05, 100.0).otherwise(0.0))
    .withColumn("cls", (col("l_quantity") > 25).cast("int"))

  test("regression tree round-trips, categorical IN nodes included") {
    val rows = for {
      lang <- Seq("en", "de", "fr"); x <- Seq(1.0, 2.0, 3.0, 4.0)
    } yield (lang, x, if (lang == "en") x else 10.0 + x)
    val d = rows.toDF("lang", "x", "y")
    val fitted = new RegressionTree(Seq("x"), "y", maxDepth = 3,
      categoricalColumns = Seq("lang")).fit(d)
    val rt = RegTreeNode.fromJValue(RegTreeNode.toJValue(fitted.root))
    assert(rt == fitted.root)
    // serde survives an actual JSON text round-trip too
    import org.json4s.jackson.JsonMethods
    val txt = JsonMethods.compact(JsonMethods.render(
      RegTreeNode.toJValue(fitted.root)))
    assert(RegTreeNode.fromJValue(JsonMethods.parse(txt)) == fitted.root)
    assert(txt.contains("\"lang IN "))
  }

  test("L2 GBT round-trips: base, rate, stages bit-equal") {
    val gbt = new GradientBoosting(Seq("l_quantity", "l_discount"), "y",
      numStages = 3, learningRate = 0.5, maxDepth = 3).fit(df)
    val rt = FittedGBT.fromJson(gbt.toJson)
    assert(rt.basePrediction == gbt.basePrediction)
    assert(rt.learningRate == gbt.learningRate)
    assert(rt.stages == gbt.stages)
    assert(rt.modelSql == gbt.modelSql)
  }

  test("logistic GBT round-trips and serves identically") {
    val gbt = new GradientBoostingClassifier(
      Seq("l_quantity", "l_discount"), "cls",
      numStages = 2, learningRate = 0.5, maxDepth = 2).fit(df)
    val rt = FittedGBTClassifier.fromJson(gbt.toJson)
    assert(rt.baseLogOdds == gbt.baseLogOdds && rt.stages == gbt.stages)
    assert(rt.marginSql == gbt.marginSql)
    val a = gbt.transform(df.limit(100)).select("prediction")
      .collect().map(_.getInt(0)).toSeq
    val b = rt.transform(df.limit(100)).select("prediction")
      .collect().map(_.getInt(0)).toSeq
    assert(a == b)
  }

  test("softmax GBT round-trips: classes, priors, per-class stages") {
    val d = df.withColumn("tier",
      when(col("l_quantity") <= 15, 0)
        .when(col("l_quantity") <= 35, 1).otherwise(2))
    val gbt = new SoftmaxGradientBoosting(
      Seq("l_quantity", "l_discount"), "tier",
      numStages = 2, learningRate = 0.5, maxDepth = 2).fit(d)
    val rt = FittedSoftmaxGBT.fromJson(gbt.toJson)
    assert(rt.classes == gbt.classes)
    assert(rt.baseLogPrior == gbt.baseLogPrior)
    assert(rt.stages == gbt.stages)
    gbt.classes.foreach(c => assert(rt.marginSql(c) == gbt.marginSql(c)))
  }

  test("regression forest round-trips: trees and mean render") {
    val rf = new RegressionRandomForest(
      Seq("l_quantity", "l_discount"), "y", numTrees = 3, maxDepth = 3)
      .fit(df)
    val rt = FittedRegressionForest.fromJson(rf.toJson)
    assert(rt.numTrees == rf.numTrees && rt.trees == rf.trees)
    assert(rt.modelSql == rf.modelSql)
  }
}
