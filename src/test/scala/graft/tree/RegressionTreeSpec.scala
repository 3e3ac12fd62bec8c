package graft.tree

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RegressionTreeSpec extends SparkSpec {
  import spark.implicits._

  test("recovers a step function exactly") {
    // y = 10 when x <= 3, else 20
    val df = (1 to 100).map(i => (i.toDouble % 6, if (i % 6 <= 3) 10.0 else 20.0))
      .toDF("x", "y")
    val fitted = new RegressionTree(Seq("x"), "y", maxDepth = 3).fit(df)
    val out = fitted.transform(df)
    assert(out.filter(abs(col("prediction") - col("y")) > 1e-9).count() == 0)
  }

  test("constant target yields a single leaf with the mean") {
    val df = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("x", "y")
    val fitted = new RegressionTree(Seq("x"), "y").fit(df)
    assert(fitted.root == RegLeaf(5.0))
  }

  test("approximates a piecewise trend on real data") {
    // target: synthetic but feature-derived -> learnable
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .withColumn("y", col("l_quantity") * 10.0 + when(col("l_discount") > 0.05, 100.0).otherwise(0.0))
    val fitted = new RegressionTree(Seq("l_quantity", "l_discount"), "y", maxDepth = 6).fit(li)
    val out = fitted.transform(li)
      .select(avg(abs(col("prediction") - col("y"))).as("mae"),
        (max("y") - min("y")).as("range")).head()
    val mae = out.getDouble(0); val range = out.getDouble(1)
    assert(mae < range * 0.05, s"mae $mae vs range $range")
  }

  test("maxDepth bounds the tree") {
    val df = (1 to 64).map(i => (i.toDouble, i.toDouble)).toDF("x", "y")
    val fitted = new RegressionTree(Seq("x"), "y", maxDepth = 2).fit(df)
    def depth(n: RegTreeNode): Int = n match {
      case RegLeaf(_) => 0
      case RegSplit(_, _, l, r) => 1 + math.max(depth(l), depth(r))
      case RegCatSplit(_, _, l, r) => 1 + math.max(depth(l), depth(r))
    }
    assert(depth(fitted.root) <= 2)
  }

  // ---- categorical IN-set splits (r12) ------------------------------

  test("categorical splits recover a planted category-set step exactly") {
    // y = 10 ⇔ lang ∈ {en, de}, else 20; the numeric distractor z
    // carries no signal — the fit must put a lang IN-set at the root
    // (the target-mean-ordered prefix is exactly the planted set or
    // its complement) and predict perfectly
    val rows = for {
      lang <- Seq("en", "de", "fr", "zh"); rep <- 1 to 5
    } yield (lang, (rep * 3 % 4).toDouble,
      if (lang == "en" || lang == "de") 10.0 else 20.0)
    val df = rows.toDF("lang", "z", "y")
    val fitted = new RegressionTree(Seq("z"), "y", maxDepth = 3,
      categoricalColumns = Seq("lang")).fit(df)
    fitted.root match {
      case RegCatSplit("lang", vs, _, _) =>
        assert(vs.toSet == Set("en", "de") || vs.toSet == Set("fr", "zh"),
          s"root IN-list: $vs")
      case other => fail(s"expected a lang IN-set root, got $other")
    }
    val out = fitted.transform(df)
    assert(out.filter(abs(col("prediction") - col("y")) > 1e-12).count() == 0,
      fitted.caseSql)
    assert(fitted.caseSql.contains("CAST(lang AS STRING) IN ("))
  }

  test("composed child thresholds: numeric split under a categorical root is exact") {
    // y = (x <= 2 ? 0 : 4) for lang ∈ {a}, flat 10 for lang = b, with
    // INTEGER-valued x so the composed child mean threshold (Σ sums /
    // n from per-category cells) is the same exact double a dedicated
    // stats pass would give — the tree must recover the rule exactly
    // at depth 2
    val rows =
      (for (x <- Seq(1.0, 2.0, 3.0, 4.0); rep <- 1 to 3)
        yield ("a", x, if (x <= 2) 0.0 else 4.0)) ++
      (for (x <- Seq(1.0, 2.0, 3.0, 4.0); rep <- 1 to 3)
        yield ("b", x, 10.0))
    val df = rows.toDF("lang", "x", "y")
    val fitted = new RegressionTree(Seq("x"), "y", maxDepth = 2,
      categoricalColumns = Seq("lang")).fit(df)
    val out = fitted.transform(df)
    assert(out.filter(abs(col("prediction") - col("y")) > 1e-12).count() == 0,
      fitted.caseSql)
    // shape: categorical root, numeric split on the informative side
    fitted.root match {
      case RegCatSplit("lang", _, l, r) =>
        assert(Seq(l, r).exists {
          case RegSplit("x", t, _, _) => t >= 2.0 && t < 3.0
          case _ => false
        }, s"expected an x-split child in ${fitted.caseSql}")
      case other => fail(s"expected a lang IN-set root, got $other")
    }
  }

  test("informative numeric split still beats a noise categorical") {
    val rows = for {
      cat <- Seq("p", "q", "r"); x <- Seq(1.0, 2.0, 3.0, 4.0)
    } yield (cat, x, if (x <= 2.0) 1.0 else 9.0)
    val df = rows.toDF("cat", "x", "y")
    val fitted = new RegressionTree(Seq("x"), "y", maxDepth = 3,
      categoricalColumns = Seq("cat")).fit(df)
    fitted.root match {
      case RegSplit("x", _, _, _) => ()
      case other => fail(s"expected numeric root on x, got $other")
    }
  }

  test("NULL categorical rows are rejected at fit time") {
    val df = Seq((Some("a"), 1.0, 1.0), (None, 2.0, 2.0))
      .toDF("lang", "x", "y")
    val ex = intercept[IllegalArgumentException] {
      new RegressionTree(Seq("x"), "y",
        categoricalColumns = Seq("lang")).fit(df)
    }
    assert(ex.getMessage.contains("NULL"))
  }
}
