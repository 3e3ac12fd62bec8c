package graft.tree

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GradientBoostingSpec extends SparkSpec {
  import spark.implicits._

  def target = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    .withColumn("y", col("l_quantity") * 10.0 +
      when(col("l_discount") > 0.05, 100.0).otherwise(0.0))

  test("each boosting stage reduces training error") {
    val df = target
    def mae(stages: Int): Double = {
      val gbt = new GradientBoosting(Seq("l_quantity", "l_discount"), "y",
        numStages = stages, learningRate = 0.5, maxDepth = 3).fit(df)
      gbt.transform(df).agg(avg(abs(col("prediction") - col("y")))).head().getDouble(0)
    }
    val m1 = mae(1); val m3 = mae(3)
    assert(m3 < m1, s"3-stage MAE $m3 should beat 1-stage $m1")
  }

  test("boosted model beats a single tree of the same depth") {
    val df = target
    val single = new RegressionTree(Seq("l_quantity", "l_discount"), "y", maxDepth = 3).fit(df)
    val singleMae = single.transform(df)
      .agg(avg(abs(col("prediction") - col("y")))).head().getDouble(0)
    val gbt = new GradientBoosting(Seq("l_quantity", "l_discount"), "y",
      numStages = 4, learningRate = 0.5, maxDepth = 3).fit(df)
    val gbtMae = gbt.transform(df)
      .agg(avg(abs(col("prediction") - col("y")))).head().getDouble(0)
    assert(gbtMae < singleMae, s"GBT MAE $gbtMae vs single-tree $singleMae")
  }

  test("fit is deterministic") {
    val df = target
    def preds() = new GradientBoosting(Seq("l_quantity"), "y", numStages = 2)
      .fit(df).transform(df).select("prediction")
      .collect().map(_.getDouble(0)).toSeq
    assert(preds() == preds())
  }

  test("constant target converges to the constant immediately") {
    val df = Seq((1.0, 7.0), (2.0, 7.0), (3.0, 7.0)).toDF("x", "y")
    val gbt = new GradientBoosting(Seq("x"), "y", numStages = 2).fit(df)
    val out = gbt.transform(df).select("prediction").collect().map(_.getDouble(0))
    assert(out.forall(p => math.abs(p - 7.0) < 1e-9))
  }
}
