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
    }
    assert(depth(fitted.root) <= 2)
  }
}
