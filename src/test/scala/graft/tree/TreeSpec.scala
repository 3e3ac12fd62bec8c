package graft.tree

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Mirrors the reference test surface (tests/test.py) plus extra
  * coverage for gini / median / mean / stopping rules / prune.
  */
class TreeSpec extends SparkSpec {
  import spark.implicits._

  /** tests/test.py:18-23 */
  def smallDf: DataFrame = Seq(
    (1.0, 0.0, 1), (2.0, 0.0, 0), (3.0, 0.0, 0), (4.0, 0.0, 1), (5.0, 1.0, 0)
  ).toDF("feature_1", "feature_2", "class")

  /** tests/test.py:84-91 — classified by x_coord > 1 */
  def heteroDf: DataFrame = Seq(
    (1.0, 0.0, 0), (2.0, 1.0, 1), (1.0, 1.0, 0), (1.0, 1.0, 0),
    (0.0, 0.0, 0), (2.0, 0.0, 1), (1.0, 1.0, 0)
  ).toDF("x_coord", "y_coord", "color")

  def predictions(node: TreeNode, df: DataFrame): Seq[Int] =
    TreeNode.classify(node, df).select("prediction").collect().map(_.getInt(0)).toSeq

  test("leaf node classify (test.py:25-31)") {
    assert(predictions(LeafNode(1), smallDf) == Seq(1, 1, 1, 1, 1))
    assert(predictions(LeafNode(0), smallDf) == Seq(0, 0, 0, 0, 0))
  }

  test("decision node classify (test.py:38-48)") {
    val d1 = DecisionNode("feature_2", 0.0, LeafNode(0), LeafNode(1))
    assert(predictions(d1, smallDf) == Seq(0, 0, 0, 0, 1))
    val d2 = DecisionNode("feature_1", 2.0, LeafNode(0), LeafNode(1))
    assert(predictions(d2, smallDf) == Seq(0, 0, 1, 1, 1))
  }

  test("entropy value (test.py:50-52)") {
    import org.apache.spark.sql.functions._
    val v = smallDf.select(EntropySplitMetric.evalFromP1(avg(col("class"))))
      .head().getDouble(0)
    assert(math.abs(v - 0.9709505944546686) < 1e-12)
    assert(math.abs(EntropySplitMetric.evalFromP1(0.4) - 0.9709505944546686) < 1e-12)
    assert(EntropySplitMetric.evalFromP1(0.0) == 0.0)
    assert(EntropySplitMetric.evalFromP1(1.0) == 0.0)
  }

  test("gini impurity") {
    assert(math.abs(GiniImpuritySplitMetric.evalFromP1(0.5) - 0.5) < 1e-12)
    assert(GiniImpuritySplitMetric.evalFromP1(0.0) == 0.0)
    import org.apache.spark.sql.functions._
    val v = smallDf.select(GiniImpuritySplitMetric.evalFromP1(avg(col("class"))))
      .head().getDouble(0)
    assert(math.abs(v - (1.0 - 0.36 - 0.16)) < 1e-12)
  }

  test("split params eager semantics (test.py:54-82)") {
    val (left, right) = SplitParams("feature_1", 2.0).split(smallDf)
    assert(left.select("feature_1").collect().map(_.getDouble(0)).toSeq == Seq(1.0, 2.0))
    assert(left.select("class").collect().map(_.getInt(0)).toSeq == Seq(1, 0))
    assert(right.select("feature_1").collect().map(_.getDouble(0)).toSeq == Seq(3.0, 4.0, 5.0))
    assert(right.select("class").collect().map(_.getInt(0)).toSeq == Seq(0, 1, 0))
  }

  test("splitting method thresholds") {
    import org.apache.spark.sql.functions._
    def thr(m: SplittingMethod): Double =
      smallDf.select(m.thresholdExpr(col("feature_1"))).head().getDouble(0)
    assert(thr(MidpointSplitter) == 3.0)
    assert(thr(MedianSplitter) == 3.0)
    assert(thr(MeanSplitter) == 3.0)
    def thr2(m: SplittingMethod): Double =
      smallDf.select(m.thresholdExpr(col("feature_2"))).head().getDouble(0)
    assert(thr2(MidpointSplitter) == 0.5)
    assert(thr2(MedianSplitter) == 0.0)
    assert(math.abs(thr2(MeanSplitter) - 0.2) < 1e-12)
  }

  test("find best split (test.py:94-97)") {
    val best = Splitting.findBestSplit(
      heteroDf, "color", Seq("x_coord", "y_coord"), EntropySplitMetric, MidpointSplitter)
    assert(best == SplitParams("x_coord", 1.0))
  }

  test("compute all splits is sorted best-first") {
    val rows = Splitting.computeAllSplits(
      heteroDf, "color", Seq("x_coord", "y_coord"), EntropySplitMetric, MidpointSplitter)
      .collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("variable") == "x_coord")
    assert(rows(0).getAs[Double]("metric") == 0.0)
    assert(rows(1).getAs[String]("variable") == "y_coord")
    assert(rows(1).getAs[Double]("metric") > 0.0)
  }

  test("decision tree fit (test.py:99-143)") {
    val params = DecisionTreeParams(Seq("x_coord", "y_coord"), "color", "midpoint", "entropy")
    val fitted = new DecisionTree(params).fit(heteroDf)
    fitted.root match {
      case DecisionNode(attr, thr, LeafNode(l, _), LeafNode(r, _)) =>
        assert(attr == "x_coord"); assert(thr == 1.0)
        assert(l == 0); assert(r == 1)
      case other => fail(s"expected a single split, got $other")
    }
    val expected = JsonMethods.parse(
      """{"params": {"feature_columns": ["x_coord", "y_coord"],
        |            "class_column": "color",
        |            "max_depth": -1, "min_split_entropy": 0.0,
        |            "min_split_samples": 0, "split_metric": "entropy",
        |            "splitting_method": "midpoint"},
        | "depth": 0,
        | "nodes": {"x_coord <= 1.0": {"color": 0}, "x_coord > 1.0": {"color": 1}}}""".stripMargin)
    assert(fitted.toJValue == expected)
    assert(JsonMethods.parse(fitted.json(Some(4))) == fitted.toJValue)
    assert(predictions(fitted.root, heteroDf) == Seq(0, 1, 0, 0, 0, 1, 0))
  }

  test("json save / load round-trip (test.py:145-154)") {
    val params = DecisionTreeParams(Seq("x_coord", "y_coord"), "color", "midpoint", "entropy")
    val fitted = new DecisionTree(params).fit(heteroDf)
    val tmp = java.nio.file.Files.createTempFile("tree", ".json").toString
    fitted.saveJson(tmp)
    val loaded = FittedDecisionTree.loadJson(tmp)
    assert(loaded.toJValue == fitted.toJValue)
    assert(predictions(loaded.root, heteroDf) == predictions(fitted.root, heteroDf))
  }

  test("max_depth stops splitting") {
    val params = DecisionTreeParams(Seq("x_coord", "y_coord"), "color", "midpoint", "entropy",
      maxDepth = 0)
    val fitted = new DecisionTree(params).fit(heteroDf)
    fitted.root match {
      case LeafNode(l, _) => assert(l == 0) // majority class
      case other => fail(s"expected leaf at max_depth=0, got $other")
    }
  }

  test("min_split_samples stops splitting") {
    val params = DecisionTreeParams(Seq("x_coord", "y_coord"), "color", "midpoint", "entropy",
      minSplitSamples = 100)
    val fitted = new DecisionTree(params).fit(heteroDf)
    assert(fitted.root.isInstanceOf[LeafNode])
  }

  test("pure class yields single leaf") {
    val df = Seq((1.0, 0), (2.0, 0), (3.0, 0)).toDF("f", "class")
    val fitted = new DecisionTree(DecisionTreeParams(Seq("f"))).fit(df)
    assert(fitted.root == LeafNode(0, "class"))
  }

  test("deeper tree fits a non-linearly-separable pattern") {
    // XOR-ish: class = (x > 0.5) != (y > 0.5)
    val rows = for (x <- 0 to 1; y <- 0 to 1; _ <- 1 to 5)
      yield (x.toDouble, y.toDouble, if (x != y) 1 else 0)
    val df = rows.toDF("x", "y", "class")
    val fitted = new DecisionTree(
      DecisionTreeParams(Seq("x", "y"), "class", "midpoint", "entropy")).fit(df)
    val preds = TreeNode.classify(fitted.root, df)
      .select("x", "y", "prediction").collect()
    preds.foreach { r =>
      val expect = if (r.getDouble(0) != r.getDouble(1)) 1 else 0
      assert(r.getInt(2) == expect, s"row $r")
    }
  }

  test("prune collapses agreeing subtrees") {
    // All-same-class data but force a split path via min entropy 0 data:
    // use a frame where a split happens yet both leaves agree.
    val df = Seq(
      (1.0, 1.0, 0), (2.0, 2.0, 0), (3.0, 1.0, 0), (4.0, 2.0, 1)
    ).toDF("a", "b", "class")
    val fitted = new DecisionTree(
      DecisionTreeParams(Seq("a", "b"), "class", "midpoint", "entropy")).fit(df, prune = true)
    // Sanity: pruned tree predicts same as unpruned on training data.
    val unpruned = new DecisionTree(
      DecisionTreeParams(Seq("a", "b"), "class", "midpoint", "entropy")).fit(df)
    assert(predictions(fitted.root, df) == predictions(unpruned.root, df))
  }

  test("feature importances sum to 1 and name the split features") {
    val params = DecisionTreeParams(Seq("x_coord", "y_coord"), "color", "midpoint", "entropy")
    val fitted = new DecisionTree(params).fit(heteroDf)
    val imp = fitted.featureImportances
    assert(math.abs(imp.values.sum - 1.0) < 1e-12)
    assert(imp("x_coord") == 1.0) // single split on x_coord
    assert(imp("y_coord") == 0.0)
  }

  test("serde parses reference-format json") {
    val j = """{"params": {"feature_columns": ["f1"], "class_column": "class",
              | "splitting_method": "mean", "split_metric": "gini",
              | "min_split_samples": 2, "min_split_entropy": 0.1, "max_depth": 3},
              | "depth": 0,
              | "nodes": {"f1 <= 2.5": {"class": 1}, "f1 > 2.5": {"class": 0}}}""".stripMargin
    val t = FittedDecisionTree.fromJson(j)
    assert(t.params == DecisionTreeParams(Seq("f1"), "class", "mean", "gini", 2, 0.1, 3))
    assert(t.root == DecisionNode("f1", 2.5, LeafNode(1), LeafNode(0)))
  }

  // ---- categorical IN-set splits in the BINARY learner (r12) --------

  test("binary categorical: planted IN-set rule recovered, probs traverse IN nodes") {
    // class 1 ⇔ lang ∈ {en, de}; a noise numeric rides along. The
    // root must be a lang IN-set (p1-ordered prefix = the planted set
    // or its complement); probExpr and its SQL render traverse it.
    val rows = for {
      lang <- Seq("en", "de", "fr", "zh"); rep <- 1 to 5
    } yield (lang, (rep * 3 % 4).toDouble,
      if (lang == "en" || lang == "de") 1 else 0)
    val df = rows.toDF("lang", "z", "class")
    val p = DecisionTreeParams(Seq("z"), "class", "mean", "entropy", maxDepth = 3)
    val fitted = new DecisionTree(p, categoricalColumns = Seq("lang")).fit(df)
    fitted.root match {
      case CatDecisionNode("lang", vs, _, _) =>
        assert(vs.toSet == Set("en", "de") || vs.toSet == Set("fr", "zh"),
          s"root IN-list: $vs")
      case other => fail(s"expected a lang IN-set root, got $other")
    }
    val out = fitted.transform(df).select("class", "prediction").collect()
    assert(out.forall(r => r.getInt(0) == r.getInt(1)))
    val probs = fitted.transformProb(df).select("lang", "p1").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(probs("en") == 1.0 && probs("fr") == 0.0, probs.toString)
    assert(fitted.probCaseSql.contains("CAST(lang AS STRING) IN ("))
    // JSON serde round-trips the categorical node
    assert(TreeNode.fromJValue(fitted.root.toJValue) == fitted.root)
    // importances name the categorical column
    assert(fitted.featureImportances("lang") == 1.0)
  }

  test("binary categorical: reference semantics unchanged when no categoricals given") {
    // the unified candidate path must reduce to the reference pick
    // exactly — same fitted tree with and without an (empty)
    // categorical list
    val df = heteroDf
    val p = DecisionTreeParams(Seq("x_coord", "y_coord"), "color", "mean",
      "entropy", maxDepth = 3)
    val a = new DecisionTree(p).fit(df)
    val b = new DecisionTree(p, categoricalColumns = Seq.empty).fit(df)
    assert(a.root == b.root)
  }

  test("binary categorical: composed child thresholds split numerics under the IN root") {
    // class = (x > 2) only for lang = a rows; lang = b is pure 0 —
    // integer-valued x so the composed child mean is exact
    val rows =
      (for (x <- Seq(1.0, 2.0, 3.0, 4.0); rep <- 1 to 3)
        yield ("a", x, if (x > 2) 1 else 0)) ++
      (for (x <- Seq(1.0, 2.0, 3.0, 4.0); rep <- 1 to 3)
        yield ("b", x, 0))
    val df = rows.toDF("lang", "x", "class")
    val p = DecisionTreeParams(Seq("x"), "class", "mean", "gini", maxDepth = 2)
    val fitted = new DecisionTree(p, categoricalColumns = Seq("lang")).fit(df)
    val out = fitted.transform(df).select("class", "prediction").collect()
    assert(out.forall(r => r.getInt(0) == r.getInt(1)), fitted.root.caseSql)
  }

  test("binary categorical: NULLs rejected at fit, median splitter rejected with mixed features") {
    val df = Seq((Some("a"), 1.0, 1), (None, 2.0, 0)).toDF("lang", "x", "class")
    val p = DecisionTreeParams(Seq("x"), "class", "mean", "gini", maxDepth = 2)
    val ex = intercept[IllegalArgumentException] {
      new DecisionTree(p, categoricalColumns = Seq("lang")).fit(df)
    }
    assert(ex.getMessage.contains("NULL"))
    val ex2 = intercept[IllegalArgumentException] {
      new DecisionTree(p.copy(splittingMethod = "median"),
        categoricalColumns = Seq("lang"))
        .fit(df.filter($"lang".isNotNull))
    }
    assert(ex2.getMessage.contains("mean splitter"))
  }
}
