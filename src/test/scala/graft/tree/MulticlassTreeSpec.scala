package graft.tree

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MulticlassTreeSpec extends SparkSpec {
  import spark.implicits._

  /** Planted 3-class rule: class = 0 if x <= 2, else (1 if y <= 0.5
    * else 2) — recoverable exactly at depth 2 by any splitter.
    */
  def threeClassDf: DataFrame = Seq(
    (1.0, 0.0, 0), (2.0, 1.0, 0), (1.0, 1.0, 0), (2.0, 0.0, 0),
    (3.0, 0.0, 1), (4.0, 0.3, 1), (5.0, 0.5, 1), (3.0, 0.2, 1),
    (3.0, 1.0, 2), (4.0, 0.9, 2), (5.0, 0.8, 2), (4.0, 1.0, 2)
  ).toDF("x", "y", "class")

  val params3 = DecisionTreeParams(Seq("x", "y"), "class", "mean", "entropy", maxDepth = 4)

  test("recovers a planted 3-class rule exactly (entropy and gini)") {
    for (m <- Seq("entropy", "gini")) {
      val fitted = new MulticlassDecisionTree(
        params3.copy(splitMetric = m)).fit(threeClassDf)
      assert(fitted.classes == Seq(0, 1, 2))
      val out = fitted.transform(threeClassDf)
        .select("class", "prediction").collect()
      assert(out.forall(r => r.getInt(0) == r.getInt(1)),
        s"$m: " + out.mkString(","))
      assert(fitted.root.leafLabels.toSet == Set(0, 1, 2))
    }
  }

  test("categorical splits recover a planted category-set rule exactly") {
    // class 0 ⇔ lang ∈ {en, de}; else class 1 ⇔ src ∈ {a, b}; else 2.
    // Pure IN-set structure — a numeric distractor z carries no
    // signal — so the fit must recover BOTH IN-lists and classify
    // perfectly, with the first split's left set exactly the rate-
    // ordered prefix {en, de}.
    val rows = for {
      lang <- Seq("en", "de", "fr", "zh")
      src <- Seq("a", "b", "c")
      rep <- 1 to 3
    } yield {
      val cls = if (lang == "en" || lang == "de") 0
                else if (src == "a" || src == "b") 1 else 2
      (lang, src, (rep * 7 % 5).toDouble, cls)
    }
    val df = rows.toDF("lang", "src", "z", "class")
    val p = DecisionTreeParams(Seq("z"), "class", "mean", "gini", maxDepth = 4)
    val fitted = new MulticlassDecisionTree(p, categoricalColumns = Seq("lang", "src"))
      .fit(df)
    val out = fitted.transform(df).select("class", "prediction").collect()
    assert(out.forall(r => r.getInt(0) == r.getInt(1)),
      fitted.caseSql + " => " + out.mkString(","))
    fitted.root match {
      case CatDecisionNode("lang", vs, _, _) =>
        // the rate-ascending prefix may land on either complement of
        // the planted partition — both encode the same split
        assert(vs.toSet == Set("en", "de") || vs.toSet == Set("fr", "zh"),
          s"root IN-list: $vs")
      case other => fail(s"expected a lang IN-set root, got $other")
    }
    // the SQL export carries the IN-lists and the JSON serde
    // round-trips the categorical nodes bit-exactly
    assert(fitted.caseSql.contains(" IN ("))
    assert(TreeNode.fromJValue(fitted.root.toJValue) == fitted.root)
  }

  test("mixed categorical + numeric: the informative numeric split still wins where it should") {
    // class = 0 iff x <= 2 regardless of category; the categorical
    // column is pure noise — the fit must pick the numeric split and
    // the noise categories must not fragment the tree
    val rows = for {
      cat <- Seq("p", "q", "r")
      x <- Seq(1.0, 2.0, 3.0, 4.0)
    } yield (cat, x, if (x <= 2.0) 0 else 1)
    val df = rows.toDF("cat", "x", "class")
    val p = DecisionTreeParams(Seq("x"), "class", "mean", "gini", maxDepth = 3)
    val fitted = new MulticlassDecisionTree(p, categoricalColumns = Seq("cat"))
      .fit(df)
    val out = fitted.transform(df).select("class", "prediction").collect()
    assert(out.forall(r => r.getInt(0) == r.getInt(1)))
    fitted.root match {
      case DecisionNode("x", _, _, _) => ()
      case other => fail(s"expected numeric root on x, got $other")
    }
  }

  test("categorical probabilities and their SQL render traverse IN-nodes") {
    val rows = for {
      lang <- Seq("en", "fr"); rep <- 1 to 4
    } yield (lang, if (lang == "en") (if (rep <= 3) 0 else 1) else 1)
    val df = rows.toDF("lang", "class")
    val p = DecisionTreeParams(Seq.empty, "class", "mean", "gini", maxDepth = 2)
    val fitted = new MulticlassDecisionTree(p, categoricalColumns = Seq("lang"))
      .fit(df)
    val probs = fitted.transformProb(df.filter($"lang" === "en"))
      .select("p_0", "p_1").distinct().collect()
    assert(probs.length == 1 &&
      math.abs(probs(0).getDouble(0) - 0.75) < 1e-12 &&
      math.abs(probs(0).getDouble(1) - 0.25) < 1e-12, probs.mkString(","))
    // the render traverses the IN-node (either complement) and
    // carries the leaf frequencies as literals
    val sql0 = fitted.probCaseSql(0)
    assert(sql0.contains("CAST(lang AS STRING) IN ('en')") ||
      sql0.contains("CAST(lang AS STRING) IN ('fr')"), sql0)
    assert(sql0.contains("0.75") && sql0.contains("0.0"), sql0)
  }

  test("k = 2: same predictions as the binary learner on a separable fixture") {
    // The learners share metrics, thresholds, stopping rules, and
    // tie-breaks but NOT the split objective: the binary learner
    // keeps the reference's unweighted metric(L)+metric(R) sum, the
    // k-ary learner uses CART's weighted child impurity (the
    // unweighted sum collapses at k >= 3 — see the fitOn comment).
    // On a separable fixture both objectives recover the planted
    // rule, so the PREDICTIONS must agree row for row.
    val df = Seq(
      (1.0, 0.0, 0), (2.0, 1.0, 0), (1.5, 1.0, 0), (2.0, 0.0, 0),
      (5.0, 0.0, 1), (6.0, 0.3, 1), (7.0, 0.5, 1), (5.5, 0.2, 1)
    ).toDF("feature_1", "feature_2", "class")
    val p = DecisionTreeParams(Seq("feature_1", "feature_2"), "class",
      "mean", "entropy", maxDepth = 4)
    val bin = new DecisionTree(p).fit(df)
    val mc = new MulticlassDecisionTree(p).fit(df)
    val binPred = bin.transform(df).select("class", "prediction")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    val mcPred = mc.transform(df).select("class", "prediction")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(binPred.sameElements(mcPred), s"${binPred.toSeq} vs ${mcPred.toSeq}")
    assert(binPred.forall { case (c, pr) => c == pr })
  }

  test("an all-constant feature (degenerate empty-side split) never wins") {
    // punct_ratio-at-sf0.01 regression shape: a constant feature
    // offers an all-rows-one-side split whose UNWEIGHTED impurity
    // sum (parent + 0) would beat every genuine split at k = 3 and
    // collapse the fit to the root majority. The weighted objective
    // scores it exactly the parent impurity, so the real feature
    // must win and the planted rule must be recovered.
    val df = Seq(
      (1.0, 0.0, 0), (2.0, 0.0, 0), (3.0, 0.0, 0), (4.0, 0.0, 0),
      (5.0, 0.0, 1), (6.0, 0.0, 1), (7.0, 0.0, 1), (8.0, 0.0, 1),
      (9.0, 0.0, 2), (10.0, 0.0, 2), (11.0, 0.0, 2), (12.0, 0.0, 2)
    ).toDF("x", "zero", "class")
    val fitted = new MulticlassDecisionTree(
      DecisionTreeParams(Seq("x", "zero"), "class", "mean", "gini",
        maxDepth = 4)).fit(df)
    assert(!fitted.root.isInstanceOf[LeafNode], fitted.root.toString)
    val out = fitted.transform(df).select("class", "prediction").collect()
    assert(out.forall(r => r.getInt(0) == r.getInt(1)), out.mkString(","))
  }

  test("k-ary metric values: evalFromCounts reduces to evalFromP1 at k = 2") {
    for (m <- SplitMetric.all; (a, b) <- Seq((3L, 7L), (0L, 5L), (4L, 4L))) {
      val p1 = if (a + b == 0) 0.0 else b.toDouble / (a + b)
      assert(math.abs(m.evalFromCounts(Seq(a, b)) - m.evalFromP1(p1)) < 1e-12,
        s"${m.name}($a,$b)")
    }
    // uniform 4-class entropy = 2 bits; uniform gini = 1 - 1/4
    assert(math.abs(EntropySplitMetric.evalFromCounts(Seq(5L, 5L, 5L, 5L)) - 2.0) < 1e-12)
    assert(math.abs(GiniImpuritySplitMetric.evalFromCounts(Seq(5L, 5L, 5L, 5L)) - 0.75) < 1e-12)
    assert(EntropySplitMetric.evalFromCounts(Seq(0L, 0L, 9L)) == 0.0)
  }

  test("majority ties resolve to the larger label (binary convention extended)") {
    // depth 0 forces an immediate leaf; counts are 2/2/2
    val tied = Seq((1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1), (5.0, 2), (6.0, 2))
      .toDF("x", "class")
    val fitted = new MulticlassDecisionTree(
      DecisionTreeParams(Seq("x"), "class", "mean", "entropy", maxDepth = 0))
      .fit(tied)
    assert(fitted.root == LeafNode(2, "class"), fitted.root.toString)
  }

  test("per-class probabilities: leaf frequencies, sum to 1, argmax = prediction") {
    // class 2 region is impure: one class-1 row sits at y > 0.5
    val noisy = threeClassDf.unionAll(Seq((4.5, 0.95, 1)).toDF("x", "y", "class"))
    val fitted = new MulticlassDecisionTree(params3.copy(maxDepth = 2)).fit(noisy)
    val out = fitted.transformProb(fitted.transform(noisy))
      .select("prediction", "p_0", "p_1", "p_2").collect()
    out.foreach { r =>
      val ps = Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(math.abs(ps.sum - 1.0) < 1e-12, ps.toString)
      // the hard label is the distribution's argmax (larger label wins ties)
      val argmax = ps.zipWithIndex.maxBy { case (p, i) => (p, i) }._2
      assert(argmax == r.getInt(0), s"pred=${r.getInt(0)} ps=$ps")
    }
    // at depth 2 the noisy class-1 row shares a leaf with class-2
    // rows: at least one leaf distribution is genuinely fractional
    // (calibrated frequencies, not hard 0/1 labels)
    assert(out.exists { r =>
      Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))
        .exists(p => p > 1e-9 && p < 1.0 - 1e-9)
    }, out.map(_.toString).mkString(","))
  }

  test("caseSql export evaluates identically to the when-chain") {
    val fitted = new MulticlassDecisionTree(params3).fit(threeClassDf)
    threeClassDf.createOrReplaceTempView("mc_fixture")
    val viaSql = spark.sql(
        s"SELECT class, CAST(${fitted.caseSql} AS INT) AS prediction FROM mc_fixture")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(viaSql.forall { case (c, p) => c == p }, viaSql.mkString(","))
  }

  test("prune collapses agreeing subtrees; stopping rules honored") {
    // pure data splits to all-0 leaves under any threshold: prune
    // collapses to a single leaf
    val pure = Seq((1.0, 0), (2.0, 0), (3.0, 0)).toDF("x", "class")
    val fitted = new MulticlassDecisionTree(
      DecisionTreeParams(Seq("x"), "class", "mean", "entropy")).fit(pure, prune = true)
    assert(fitted.root == LeafNode(0, "class"))
    // minSplitSamples floors the node size
    val floored = new MulticlassDecisionTree(
      DecisionTreeParams(Seq("x", "y"), "class", "mean", "entropy",
        minSplitSamples = 100L)).fit(threeClassDf)
    assert(floored.root.isInstanceOf[LeafNode])
  }
}
