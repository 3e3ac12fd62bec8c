package graft.tree

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ApproxSplitterSpec extends SparkSpec {

  test("approx median tracks exact median on real data") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.01")
    for (c <- Seq("l_quantity", "l_extendedprice", "l_discount")) {
      val r = li.agg(
        MedianSplitter.thresholdExpr(col(c)).as("exact"),
        ApproxMedianSplitter.thresholdExpr(col(c)).as("approx")).head()
      val exact = r.getDouble(0); val approx = r.getDouble(1)
      val spread = li.agg(max(col(c)) - min(col(c))).head().getDouble(0)
      assert(math.abs(approx - exact) <= spread * 0.01,
        s"$c: approx $approx vs exact $exact (spread $spread)")
    }
  }

  test("fit works with the approx splitter and round-trips its name") {
    val labeled = graft.Tables.labeledLineitem(spark, "/root/testdata/sf0.001")
    val params = DecisionTreeParams(Seq("l_discount", "l_quantity"), "class",
      "approx_median", "gini", maxDepth = 2)
    val fitted = new DecisionTree(params).fit(labeled)
    assert(fitted.root.isInstanceOf[DecisionNode])
    val loaded = FittedDecisionTree.fromJson(fitted.json())
    assert(loaded.params.splittingMethod == "approx_median")
    assert(loaded.root == fitted.root)
  }
}
