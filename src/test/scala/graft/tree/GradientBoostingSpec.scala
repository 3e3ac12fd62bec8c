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

  // ---- logistic-loss classifier ------------------------------------

  /** Oblique noisy binary fixture: the true boundary
    * quantity + 600·discount > 40 is diagonal (inexpressible by one
    * axis-aligned depth-3 tree), and the flip rate is kept at 5% so
    * the staircase-approximation error — the thing boosting fixes —
    * dominates the noise ceiling instead of drowning under it.
    */
  def labeledDiag = {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val base = (col("l_quantity") + col("l_discount") * 600.0) > 40.0
    val key = concat(col("l_orderkey").cast("string"), lit("_"),
      col("l_linenumber").cast("string"))
    val flip = graft.ops.Sampling.hashPercentile(key) < 5
    li.withColumn("class",
      when(flip, lit(1) - base.cast("int")).otherwise(base.cast("int")))
  }

  private def f1Of(scored: org.apache.spark.sql.DataFrame): Double =
    graft.ops.Evaluation.binaryMetrics(scored, "class", "p", 0.5)
      .select("f1").head().getDouble(0)

  test("logistic GBT beats a single tree's F1 on the oblique noisy fixture") {
    val df = labeledDiag
    val feats = Seq("l_quantity", "l_discount", "l_tax")
    // the strongest single tree this splitter family produces on the
    // fixture: depth 3 ties depth 2 at 0.90485 — the fixed
    // feature-mean threshold lattice saturates there (measured)
    val single = new DecisionTree(DecisionTreeParams(
      feats, "class", "mean", "gini", maxDepth = 3)).fit(df)
    val singleF1 = f1Of(single.transform(df)
      .withColumn("p", col("prediction").cast("double")))
    // boosted DEPTH-2 stages with gradient-weighted thresholds beat
    // the deeper single tree: each stage's |residual|-weighted
    // thresholds pull new split points into the still-misfit boundary
    // band, refining past the single tree's lattice ceiling (without
    // the weighting, every config ties 0.90485 at best — measured)
    val gbt = new GradientBoostingClassifier(feats, "class",
      numStages = 12, learningRate = 0.5, maxDepth = 2).fit(df)
    val gbtF1 = f1Of(gbt.transform(df)
      .withColumn("p", col("prediction").cast("double")))
    assert(gbtF1 > singleF1, s"GBT F1 $gbtF1 vs single-tree $singleF1")
  }

  test("classifier margin/probability/prediction are mutually consistent") {
    val df = labeledDiag
    val gbt = new GradientBoostingClassifier(
      Seq("l_quantity", "l_discount"), "class",
      numStages = 2, learningRate = 0.5, maxDepth = 2).fit(df)
    val out = gbt.transform(df)
      .select("margin", "probability", "prediction").collect()
    out.foreach { r =>
      val (m, p, pred) = (r.getDouble(0), r.getDouble(1), r.getInt(2))
      assert(math.abs(p - 1.0 / (1.0 + math.exp(-m))) < 1e-12)
      assert(pred == (if (m > 0) 1 else 0))
      assert(p > 0.0 && p < 1.0)
    }
    // DuckDB-side portability of marginSql is proven end-to-end by
    // the q_gbt_classify oracle (hash-exact at both SFs)
  }

  test("classifier base margin is finite on a single-class fixture") {
    val df = Seq((1.0, 1), (2.0, 1), (3.0, 1)).toDF("x", "class")
    val gbt = new GradientBoostingClassifier(Seq("x"), "class",
      numStages = 1).fit(df)
    val m = gbt.transform(df).select("margin").head().getDouble(0)
    assert(!m.isInfinite && !m.isNaN && m > 0)
  }

  test("constant target converges to the constant immediately") {
    val df = Seq((1.0, 7.0), (2.0, 7.0), (3.0, 7.0)).toDF("x", "y")
    val gbt = new GradientBoosting(Seq("x"), "y", numStages = 2).fit(df)
    val out = gbt.transform(df).select("prediction").collect().map(_.getDouble(0))
    assert(out.forall(p => math.abs(p - 7.0) < 1e-9))
  }

  // ---- early stopping (r12) ------------------------------------------

  test("early stopping halts on held-out loss and keeps the best prefix") {
    // very noisy labels: extra stages past the signal overfit the
    // 35%-flip noise, so the held-out log loss bottoms out early and
    // the selected prefix must be shorter than the stage budget
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val base = (col("l_quantity") + col("l_discount") * 600.0) > 40.0
    val key = concat(col("l_orderkey").cast("string"), lit("_"),
      col("l_linenumber").cast("string"))
    val flip = graft.ops.Sampling.hashPercentile(key) < 35
    val df = li.withColumn("class",
      when(flip, lit(1) - base.cast("int")).otherwise(base.cast("int")))
    val es = new GradientBoostingClassifier(
      Seq("l_quantity", "l_discount", "l_tax"), "class",
      numStages = 12, learningRate = 0.8, maxDepth = 3,
      validationFraction = 0.25, earlyStoppingPatience = 2).fit(df)
    assert(es.stages.size < 12,
      s"expected early stop, got all ${es.stages.size} stages")
    assert(es.stages.nonEmpty)
    // determinism: the same fit selects the same prefix
    val es2 = new GradientBoostingClassifier(
      Seq("l_quantity", "l_discount", "l_tax"), "class",
      numStages = 12, learningRate = 0.8, maxDepth = 3,
      validationFraction = 0.25, earlyStoppingPatience = 2).fit(df)
    assert(es2.stages == es.stages)
  }

  test("L2 early stopping: selected prefix's validation MSE is the minimum over prefixes") {
    val df = target
    val es = new GradientBoosting(Seq("l_quantity", "l_discount"), "y",
      numStages = 8, learningRate = 0.5, maxDepth = 2,
      validationFraction = 0.25, earlyStoppingPatience = 2).fit(df)
    val full = new GradientBoosting(Seq("l_quantity", "l_discount"), "y",
      numStages = 8, learningRate = 0.5, maxDepth = 2).fit(df)
    // the validation split is deterministic — recompute each prefix's
    // held-out MSE over the FULL fit's stages and check the early-
    // stopped size is argmin over the prefixes it examined
    val isVal = {
      val h = xxhash64((lit(42L) +: lit(-1) +:
        Seq("l_quantity", "l_discount").map(col)): _*)
      pmod(h, lit(1000L)) < lit(250L)
    }
    def mse(stages: Int): Double = {
      val model = full.stages.take(stages)
        .foldLeft(lit(full.basePrediction): org.apache.spark.sql.Column)(
          (acc, t) => acc + lit(0.5) * t.predictionExpr)
      val err = col("y") - model
      df.filter(isVal).agg(avg(err * err)).head().getDouble(0)
    }
    // the early-stopped prefix cannot be beaten by any SHORTER prefix
    // (it kept the best seen before patience ran out); sanity: its
    // MSE ≤ the 1-stage prefix's
    assert(mse(es.stages.size) <= mse(1) + 1e-9)
    assert(es.stages.nonEmpty && es.stages.size <= 8)
  }

  // ---- categorical features in the boosters (r12) -------------------

  test("logistic GBT takes categorical columns directly and recovers a planted IN-set interaction") {
    // label = 1 ⇔ (lang ∈ {en, de}) AND (x > 2) — an interaction
    // (neither feature alone separates it; a pure XOR would give a
    // greedy learner zero first-split gain and nothing could enter
    // it) that needs an IN-set split composed with a numeric split
    // inside the staged residual fits; exact recovery proves the
    // categorical machinery works through the booster
    val rows = for {
      lang <- Seq("en", "de", "fr", "zh")
      x <- Seq(1.0, 2.0, 3.0, 4.0)
      rep <- 1 to 3
    } yield {
      val inSet = lang == "en" || lang == "de"
      (lang, x, if (inSet && x > 2.0) 1 else 0)
    }
    val df = rows.toDF("lang", "x", "class")
    val gbt = new GradientBoostingClassifier(Seq("x"), "class",
      numStages = 6, learningRate = 0.5, maxDepth = 2,
      categoricalColumns = Seq("lang")).fit(df)
    val out = gbt.transform(df).select("class", "prediction").collect()
    assert(out.forall(r => r.getInt(0) == r.getInt(1)),
      gbt.marginSql.take(400))
    // the rendered margin carries portable IN-lists
    assert(gbt.marginSql.contains("CAST(lang AS STRING) IN ("))
  }

  test("softmax GBT with a categorical feature recovers a 3-class category rule") {
    // class = 0 ⇔ lang ∈ {en}, 1 ⇔ lang ∈ {de, fr}, else 2 — the
    // prefix machinery must carve three category groups across
    // stages/classes (one IN-set can only bipartition)
    val rows = for {
      lang <- Seq("en", "de", "fr", "zh", "ru"); rep <- 1 to 4
    } yield {
      val cls = if (lang == "en") 0
                else if (lang == "de" || lang == "fr") 1 else 2
      (lang, (rep % 3).toDouble, cls)
    }
    val df = rows.toDF("lang", "z", "class")
    val gbt = new SoftmaxGradientBoosting(Seq("z"), "class",
      numStages = 6, learningRate = 0.5, maxDepth = 2,
      categoricalColumns = Seq("lang")).fit(df)
    val out = gbt.transform(df).select("class", "prediction").collect()
    assert(out.forall(r => r.getInt(0) == r.getInt(1)))
    assert(gbt.marginSql(gbt.classes.head).contains("CAST(lang AS STRING) IN ("))
  }
}
