package graft.tree

import graft.SparkSpec
import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

/** The q_dt_quality_distill composition: a decision tree fitted on
  * token-statistic features distills the composite quality heuristic
  * into a cheap filter — the two engine halves (tree fit, text
  * features) composing in one declarative plan.
  */
class QualityDistillSpec extends SparkSpec {

  lazy val feats = {
    val t = col("text")
    graft.Tables.documents(spark, "/root/testdata/sf0.01").select(
      col("doc_id"),
      TextAnalysis.wsTokenCount(t).cast("double").as("ws_tokens"),
      round(TextAnalysis.alphaRatio(t), 6).as("alpha_ratio"),
      round(TextAnalysis.punctRatio(t), 6).as("punct_ratio"),
      round(TextAnalysis.stopwordRatio(t), 6).as("stop_ratio"),
      (round(TextAnalysis.qualityScore(t), 6) >= 0.62).cast("int").as("class"))
  }

  test("tree on token stats distills the quality heuristic") {
    val params = DecisionTreeParams(
      Seq("ws_tokens", "alpha_ratio", "punct_ratio", "stop_ratio"),
      "class", "mean", "gini", maxDepth = 4)
    val fitted = new DecisionTree(params).fit(feats)
    val scored = fitted.transform(feats).cache()
    val n = scored.count()
    val pos = scored.filter(col("class") === 1).count()
    assert(pos > n / 4 && pos < 3 * n / 4, s"label balance $pos/$n")
    val acc = scored.filter(col("prediction") === col("class")).count().toDouble / n
    scored.unpersist()
    assert(acc >= 0.85, s"distillation accuracy $acc")
    // the rendered CASE must reference the features, proving the tree
    // actually split on them (not a constant-leaf degenerate fit)
    assert(fitted.root.caseSql.contains("ws_tokens"), fitted.root.caseSql)
  }
}
