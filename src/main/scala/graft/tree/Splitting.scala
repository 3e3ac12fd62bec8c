package graft.tree

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Split point: rows with `attribute <= threshold` go left, rest right.
  *
  * Reference semantics: decision_tree_stuff/splitting.py:9-22
  * (`SplitParams.split`). Spark-first: the split is two pushed-down
  * filters over one scan — Catalyst pushes both predicates to the
  * parquet reader, so neither side materializes the other's rows.
  */
final case class SplitParams(attribute: String, threshold: Double) {
  def leftCond: Column  = col(attribute) <= lit(threshold)
  def rightCond: Column = col(attribute) > lit(threshold)

  def split(samples: DataFrame): (DataFrame, DataFrame) =
    (samples.filter(leftCond), samples.filter(rightCond))

  def toDebugString: String = s"""{ "$attribute" <= $threshold }"""
}

/** Threshold chooser for a candidate split on one feature.
  * Reference: decision_tree_stuff/splitting.py:25-58. Every variant is
  * a single declarative aggregate — partial-aggregated map-side, so the
  * shuffle carries O(partitions) values regardless of row count.
  */
sealed trait SplittingMethod {
  def name: String
  /** Aggregate expression producing the threshold for a feature column. */
  def thresholdExpr(c: Column): Column
}

case object MidpointSplitter extends SplittingMethod {
  val name = "midpoint"
  def thresholdExpr(c: Column): Column = (min(c) + max(c)) / 2.0
}

case object MedianSplitter extends SplittingMethod {
  val name = "median"
  def thresholdExpr(c: Column): Column = median(c)
}

case object MeanSplitter extends SplittingMethod {
  val name = "mean"
  def thresholdExpr(c: Column): Column = avg(c)
}

/** Scale path for the median splitter: `median()` is an exact
  * sort-based aggregate — at 100 TB that is a per-group sort.
  * `percentile_approx` (t-digest-style sketch) is single-pass,
  * mergeable, and bounded-memory; error is controlled by `accuracy`.
  */
case object ApproxMedianSplitter extends SplittingMethod {
  val name = "approx_median"
  val accuracy = 10000
  def thresholdExpr(c: Column): Column =
    percentile_approx(c, lit(0.5), lit(accuracy))
}

object SplittingMethod {
  val all: Seq[SplittingMethod] =
    Seq(MidpointSplitter, MedianSplitter, MeanSplitter, ApproxMedianSplitter)
  def forName(n: String): SplittingMethod =
    all.find(_.name == n).getOrElse(throw new IllegalArgumentException(s"unknown splitting method: $n"))
}

/** Impurity metric evaluated from the class-1 probability of a
  * partition. Reference: decision_tree_stuff/splitting.py:61-97.
  * Both variants are pure `Column` expressions → whole-stage codegen.
  */
sealed trait SplitMetric {
  def name: String
  def seekMinimum: Boolean
  /** Column form, NaN-free (0·log2(0) := 0 as in the reference's fill_nan). */
  def evalFromP1(p1: Column): Column
  /** Driver-side form for per-node stats (same arithmetic as evalFromP1). */
  def evalFromP1(p1: Double): Double
  /** K-ary generalization over a class-count vector — the reference
    * is binary by construction (splitting.py:70-86 computes p0/p1
    * only), but real curation label spaces (lang, topic, quality
    * tier) are k-ary; for k = 2 this reduces exactly to evalFromP1.
    * Empty partitions read 0 (same limit convention as evalFromP1).
    */
  def evalFromCounts(counts: Seq[Long]): Double =
    evalFromMasses(counts.map(_.toDouble))
  /** Weighted-mass form (r12): class masses are sum(w) — fractional
    * for soft-dedup 1/n weights. The Long form delegates here
    * (identical arithmetic: c/n with c integral reads the same
    * double either way).
    */
  def evalFromMasses(counts: Seq[Double]): Double
}

case object EntropySplitMetric extends SplitMetric {
  val name = "entropy"
  val seekMinimum = true
  def evalFromP1(p1: Column): Column = {
    val p0 = lit(1.0) - p1
    // -p*log2(p) with the p==0 limit taken as 0 (polars fill_nan(0.0))
    def term(p: Column): Column = when(p > 0.0, -p * log2(p)).otherwise(0.0)
    term(p0) + term(p1)
  }
  def evalFromP1(p1: Double): Double = {
    val p0 = 1.0 - p1
    def term(p: Double): Double = if (p > 0.0) -p * (math.log(p) / math.log(2.0)) else 0.0
    term(p0) + term(p1)
  }
  def evalFromMasses(counts: Seq[Double]): Double = {
    val n = counts.sum
    if (n == 0.0) 0.0
    else counts.foldLeft(0.0) { (acc, c) =>
      if (c == 0.0) acc
      else { val p = c / n; acc - p * (math.log(p) / math.log(2.0)) }
    }
  }
}

case object GiniImpuritySplitMetric extends SplitMetric {
  val name = "gini"
  val seekMinimum = true
  def evalFromP1(p1: Column): Column = {
    val p0 = lit(1.0) - p1
    lit(1.0) - p0 * p0 - p1 * p1
  }
  def evalFromP1(p1: Double): Double = {
    val p0 = 1.0 - p1
    1.0 - p0 * p0 - p1 * p1
  }
  def evalFromMasses(counts: Seq[Double]): Double = {
    val n = counts.sum
    if (n == 0.0) 0.0
    else 1.0 - counts.foldLeft(0.0) { (acc, c) =>
      val p = c / n; acc + p * p
    }
  }
}

object SplitMetric {
  val all: Seq[SplitMetric] = Seq(EntropySplitMetric, GiniImpuritySplitMetric)
  def forName(n: String): SplitMetric =
    all.find(_.name == n).getOrElse(throw new IllegalArgumentException(s"unknown split metric: $n"))
}

/** Candidate-split scoring. Reference: splitting.py:100-169
  * (`compute_all_splits` / `find_best_split`).
  */
object Splitting {

  /** Score every feature's candidate split, distributed end to end.
    *
    * Reference shape (splitting.py:116-146): melt → per-variable
    * threshold → per-(variable, threshold) left/right class-1
    * probability → metric(left) + metric(right) → sort.
    *
    * Spark-first plan: `stack` unpivots features in the scan
    * projection (no shuffle); per-variable thresholds are a tiny
    * `groupBy(variable)` aggregate broadcast-joined back; the final
    * stats are one hash aggregate with map-side partial aggregation.
    * Shuffled bytes are O(partitions × features), not O(rows).
    *
    * Output columns: variable, threshold, left_p1, right_p1, metric —
    * sorted best-first (deterministic tie-break: metric, variable).
    */
  def computeAllSplits(
      samples: DataFrame,
      classColumn: String,
      features: Seq[String],
      metric: SplitMetric,
      method: SplittingMethod): DataFrame = {
    require(features.nonEmpty, "No splittable attrs")
    val stackArgs = features.map(f => s"'$f', cast(`$f` as double)").mkString(", ")
    val melted = samples.select(
      col(classColumn).cast("double").as("cls"),
      expr(s"stack(${features.size}, $stackArgs)").as(Seq("variable", "value")))

    val thresholds = melted.groupBy("variable")
      .agg(method.thresholdExpr(col("value")).as("threshold"))

    val scored = melted
      .join(broadcast(thresholds), "variable")
      .groupBy(col("variable"), col("threshold"))
      .agg(
        coalesce(avg(when(col("value") <= col("threshold"), col("cls"))), lit(0.0)).as("left_p1"),
        coalesce(avg(when(col("value") > col("threshold"), col("cls"))), lit(0.0)).as("right_p1"))
      .withColumn("metric",
        metric.evalFromP1(col("left_p1")) + metric.evalFromP1(col("right_p1")))

    val ord =
      if (metric.seekMinimum) Seq(col("metric").asc, col("variable").asc)
      else Seq(col("metric").desc, col("variable").asc)
    scored.orderBy(ord: _*)
  }

  /** Best split = head of computeAllSplits (reference splitting.py:152-169). */
  def findBestSplit(
      samples: DataFrame,
      classColumn: String,
      features: Seq[String],
      metric: SplitMetric,
      method: SplittingMethod): SplitParams = {
    val head = computeAllSplits(samples, classColumn, features, metric, method)
      .select("variable", "threshold").head()
    SplitParams(head.getString(0), head.getDouble(1))
  }
}
