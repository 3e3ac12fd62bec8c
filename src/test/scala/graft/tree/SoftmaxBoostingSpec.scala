package graft.tree

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SoftmaxBoostingSpec extends SparkSpec {
  import spark.implicits._

  /** Oblique 3-class tiers: quantity + 600·discount at 30/45 with 5%
    * rotation noise — no single axis-aligned tree expresses the
    * diagonal tier boundaries.
    */
  def labeledTiers = {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val score = col("l_quantity") + col("l_discount") * 600.0
    val base = when(score <= 30.0, 0).when(score <= 45.0, 1).otherwise(2)
    val key = concat(col("l_orderkey").cast("string"), lit("_"),
      col("l_linenumber").cast("string"))
    val flip = graft.ops.Sampling.hashPercentile(key) < 5
    li.withColumn("class", when(flip, (base + 1) % 3).otherwise(base))
  }

  val feats = Seq("l_quantity", "l_discount", "l_tax")

  private def acc(scored: org.apache.spark.sql.DataFrame): Double =
    scored.agg(avg((col("class") === col("prediction")).cast("double")))
      .head().getDouble(0)

  test("softmax GBT beats the single k-ary tree on oblique 3-class tiers") {
    val df = labeledTiers.persist()
    val single = new MulticlassDecisionTree(DecisionTreeParams(
      feats, "class", "mean", "gini", maxDepth = 3)).fit(df)
    val singleAcc = acc(single.transform(df))
    // measured on this fixture: single d=3 0.8002; softmax d=3 n=12
    // 0.8488 (gradient-weighted stage thresholds doing the refining)
    val gbt = new SoftmaxGradientBoosting(feats, "class",
      numStages = 12, learningRate = 1.0, maxDepth = 3).fit(df)
    val gbtAcc = acc(gbt.transform(df))
    assert(gbtAcc > singleAcc, s"softmax $gbtAcc vs single tree $singleAcc")
    df.unpersist(); ()
  }

  test("margins, argmax, and the aliased SQL render are mutually consistent") {
    val df = labeledTiers
    val gbt = new SoftmaxGradientBoosting(feats, "class",
      numStages = 2, learningRate = 0.5, maxDepth = 2).fit(df)
    assert(gbt.classes == Seq(0, 1, 2))
    val out = gbt.transform(df)
      .select("margin_0", "margin_1", "margin_2", "prediction").collect()
    out.foreach { r =>
      val ms = Seq(r.getDouble(0), r.getDouble(1), r.getDouble(2))
      val best = ms.max
      // ties to the LARGER label: last index attaining the max
      val want = ms.zipWithIndex.filter(_._1 == best).map(_._2).max
      assert(r.getInt(3) == want, s"margins $ms -> ${r.getInt(3)}")
    }
    // every class's margin starts at its log prior
    val total = df.count().toDouble
    val share1 = df.filter($"class" === 1).count() / total
    assert(math.abs(gbt.baseLogPrior(1) - math.log(share1)) < 1e-12)
    // argmax SQL mirrors the expression chain shape
    val sql = gbt.argmaxSql(c => s"m_$c")
    assert(sql.contains("WHEN m_2 >= m_1 AND m_2 >= m_0 THEN 2"))
    assert(sql.contains("WHEN m_1 >= m_0 THEN 1") && sql.contains("ELSE 0"))
  }

  test("single-class degenerate fit yields that class everywhere, finite margins") {
    val df = Seq((1.0, 2), (2.0, 2), (3.0, 2)).toDF("x", "class")
    val gbt = new SoftmaxGradientBoosting(Seq("x"), "class", numStages = 1)
      .fit(df)
    val got = gbt.transform(df).select("prediction", "margin_2").collect()
    assert(got.forall(r => r.getInt(0) == 2 && !r.getDouble(1).isInfinite))
  }
}
