package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binary-classifier evaluation — the metrics read after every
  * quality-filter distillation (`q_dt_quality_distill`) or label
  * model: confusion counts at a threshold, accuracy / precision /
  * recall / F1, and EXACT tie-aware ROC AUC.
  *
  * AUC is the Mann–Whitney statistic with AVERAGE ranks for tied
  * scores — the textbook-exact definition, not a trapezoid over
  * sampled thresholds. Ties are the common case for tree models
  * (every leaf emits one probability), and naive row_number ranking
  * is both wrong under ties and non-deterministic; average ranks are
  * unique, so the whole metric is exactly reproducible cross-engine.
  *
  * Scale: the corpus is scanned ONCE for the confusion aggregate and
  * once for the per-DISTINCT-score rank frame (map-side combined —
  * the rank window then runs over score cardinality, not rows: a
  * tree has ≤ leaves distinct scores, and any continuous score
  * 6dp-rounds to ≤ 10⁶ groups, so the global rank window is
  * model-sized by construction, never corpus-sized).
  */
object Evaluation {

  /** Reliability (calibration) table: scored rows bucketed into
    * `bins` fixed-width probability bins, each reporting its size,
    * mean predicted probability, observed positive rate, and the
    * |gap| between them — the per-bin view behind expected
    * calibration error, read before trusting a model's probabilities
    * as sampling weights. One map-side-combined aggregate over one
    * scan; output is ≤ `bins` rows.
    */
  def calibrationTable(scored: DataFrame, labelCol: String,
                       probCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val y = col(labelCol).cast("int"); val p = col(probCol).cast("double")
    scored.select(y.as("y"), p.as("p"))
      .groupBy(least(floor(col("p") * bins), lit(bins - 1)).cast("int").as("bin"))
      .agg(count(lit(1)).as("n"),
        avg("p").as("_mp"),
        avg(col("y").cast("double")).as("_or"))
      .select(col("bin"), col("n"),
        round(col("_mp"), 6).as("mean_p"),
        round(col("_or"), 6).as("obs_rate"),
        round(abs(col("_mp") - col("_or")), 6).as("gap"))
  }

  /** A fitted isotonic (monotone non-decreasing) score→probability
    * map: piecewise-constant over score intervals. `boundaries(i)` is
    * the UPPER edge of pool i (the largest score observed in it);
    * a score ≤ boundaries(i) and > boundaries(i−1) calibrates to
    * `values(i)`; scores above the last boundary clamp to the last
    * value (standard isotonic extrapolation).
    */
  final case class IsotonicModel(boundaries: Seq[Double], values: Seq[Double]) {
    require(boundaries.nonEmpty && boundaries.length == values.length)
    require(values.zip(values.tail).forall { case (a, b) => a <= b },
      "isotonic values must be non-decreasing")

    /** Calibrated probability as ONE codegen'd when-chain. */
    def expr(score: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      boundaries.init.zip(values.init).foldRight(
          lit(values.last): org.apache.spark.sql.Column) {
        case ((b, v), acc) => when(score <= b, v).otherwise(acc)
      }

    /** The same map as portable SQL (rendered doubles — the fit
      * oracle pattern). */
    def caseSql(scoreSql: String): String =
      if (boundaries.size == 1) s"(${values.head})"
      else "(CASE " + boundaries.init.zip(values.init).map {
        case (b, v) => s"WHEN $scoreSql <= $b THEN $v"
      }.mkString(" ") + s" ELSE ${values.last} END)"
  }

  /** Isotonic calibration (pool-adjacent-violators) of a score
    * column against a 0/1 label — the standard non-parametric
    * recalibration a reliability table motivates (Zadrozny & Elkan
    * 2002): find the monotone step function minimizing squared error
    * to the observed labels.
    *
    * Scale shape: ONE map-side-combined aggregate collapses the
    * corpus to per-DISTINCT-score (n, positives) rows — model-sized
    * by the same argument as the AUC rank frame (tree scores have ≤
    * leaves distinct values; continuous scores should be pre-rounded
    * 6dp) — and the driver runs the classic PAV stack over those ≤
    * 10⁶ rows. Rows never reach the driver; score groups do.
    */
  /** The ≤10⁶-distinct-score contract, ENFORCED (r12 verdict): the
    * per-distinct-score collect is capped with a plan-side LIMIT
    * (no extra scan — the agg short-circuits into a bounded take),
    * so a caller passing unrounded continuous scores fails fast with
    * a pre-round hint instead of collecting corpus-cardinality rows
    * onto the driver.
    */
  val MaxScoreGroups: Int = 1000000

  def isotonicFit(scored: DataFrame, labelCol: String,
                  probCol: String): IsotonicModel = {
    val grouped = scored
      .select(col(probCol).cast("double").as("p"),
        col(labelCol).cast("int").as("y"))
      .groupBy("p")
      .agg(count(lit(1)).as("n"), sum(col("y").cast("long")).as("pos"))
      .orderBy("p")
      .limit(MaxScoreGroups + 1)
      .collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    require(grouped.nonEmpty, "isotonicFit: empty input")
    require(grouped.length <= MaxScoreGroups,
      s"isotonicFit: more than $MaxScoreGroups distinct scores in " +
        s"'$probCol' — pre-round continuous scores (e.g. round(p, 6)) " +
        "before calibrating")
    pav(grouped.toSeq)
  }

  /** The classic PAV stack over score-ascending (score, n, positives)
    * groups: merge while the top two pools violate monotonicity.
    */
  private def pav(groups: Seq[(Double, Long, Long)]): IsotonicModel = {
    final case class Pool(upper: Double, w: Long, mean: Double)
    val stack = scala.collection.mutable.ArrayBuffer.empty[Pool]
    groups.foreach { case (p, n, pos) =>
      var cur = Pool(p, n, pos.toDouble / n)
      while (stack.nonEmpty && stack.last.mean >= cur.mean) {
        val prev = stack.remove(stack.size - 1)
        val w = prev.w + cur.w
        cur = Pool(cur.upper, w,
          (prev.mean * prev.w + cur.mean * cur.w) / w)
      }
      stack += cur
    }
    IsotonicModel(stack.map(_.upper).toSeq, stack.map(_.mean).toSeq)
  }

  /** One-vs-rest isotonic recalibration for k-ary probabilities
    * (r12; Zadrozny & Elkan 2002's multiclass extension): per class
    * c, PAV-fit p_c against 1{label = c}; serve by calibrating each
    * class's probability and RENORMALIZING the k results per row
    * (guarded — an all-zero calibrated row falls back to the uniform
    * 1/k). One fused scan: the k (class, prob) pairs explode into a
    * single per-(class, DISTINCT score) map-side-combined aggregate —
    * model-sized (tree probabilities have ≤ leaves distinct values;
    * pre-round continuous scores 6dp) — and the driver runs PAV per
    * class over those rows.
    */
  def isotonicFitMulticlass(scored: DataFrame, labelCol: String,
      probCols: Seq[(Int, String)]): Seq[(Int, IsotonicModel)] = {
    require(probCols.nonEmpty, "need at least one (class, probCol) pair")
    val y = col(labelCol).cast("int")
    val entries = probCols.flatMap { case (c, pc) =>
      Seq(lit(c), col(pc).cast("double"))
    }
    val maxRows = MaxScoreGroups // shared driver-collect budget (see isotonicFit)
    val grouped = scored
      .select(y.as("y"), explode(map(entries: _*)).as(Seq("cls", "p")))
      .groupBy("cls", "p")
      .agg(count(lit(1)).as("n"),
        sum((col("y") === col("cls")).cast("long")).as("pos"))
      .orderBy("cls", "p")
      .limit(maxRows + 1)
      .collect()
    require(grouped.length <= maxRows,
      s"isotonicFitMulticlass: more than $maxRows (class, distinct score) " +
        "groups — pre-round continuous scores (e.g. round(p, 6)) before " +
        "calibrating")
    probCols.map { case (c, _) =>
      val rows = grouped.filter(_.getInt(0) == c)
        .map(r => (r.getDouble(1), r.getLong(2), r.getLong(3))).toSeq
      require(rows.nonEmpty, s"isotonicFitMulticlass: no rows for class $c")
      c -> pav(rows)
    }
  }

  /** K-ary reliability table (r11): the binary [[calibrationTable]]
    * generalized one-vs-rest — for every (class c, its probability
    * column) the rows bin by p_c and the observed rate is
    * P(label = c | bin). One scan: the k (class, prob) pairs explode
    * per row (k is the label count, not data-sized) into a single
    * map-side-combined aggregate over ≤ k·bins groups.
    *
    * @param probCols (class label, probability column) pairs — e.g.
    *                 the k-ary tree/forest's `p_<c>` columns;
    *                 pre-round them (6dp) so both engines group
    *                 identical tie classes
    */
  def calibrationTableMulticlass(scored: DataFrame, labelCol: String,
                                 probCols: Seq[(Int, String)],
                                 bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    require(probCols.nonEmpty, "need at least one (class, probCol) pair")
    val y = col(labelCol).cast("int")
    val entries = probCols.flatMap { case (c, pc) =>
      Seq(lit(c), col(pc).cast("double"))
    }
    scored.select(y.as("y"), explode(map(entries: _*)).as(Seq("cls", "p")))
      .groupBy(col("cls"),
        least(floor(col("p") * bins), lit(bins - 1)).cast("int").as("bin"))
      .agg(count(lit(1)).as("n"),
        avg("p").as("_mp"),
        avg((col("y") === col("cls")).cast("double")).as("_or"))
      .select(col("cls"), col("bin"), col("n"),
        round(col("_mp"), 6).as("mean_p"),
        round(col("_or"), 6).as("obs_rate"),
        round(abs(col("_mp") - col("_or")), 6).as("gap"))
  }

  /** One-row metrics frame over scored rows.
    *
    * @param labelCol 0/1 integer label
    * @param probCol  score in [0, 1]; pre-round it (6dp) so both
    *                 engines group identical tie classes
    */
  def binaryMetrics(scored: DataFrame, labelCol: String, probCol: String,
                    threshold: Double): DataFrame = {
    val base = scored.select(col(labelCol).cast("int").as("y"),
      col(probCol).cast("double").as("p"))
    val conf = base.agg(
      count(lit(1)).as("n"),
      sum(col("y").cast("long")).as("n_pos"),
      count(when(col("p") >= threshold && col("y") === 1, 1)).as("tp"),
      count(when(col("p") >= threshold && col("y") === 0, 1)).as("fp"),
      count(when(col("p") < threshold && col("y") === 1, 1)).as("fn"))
    val grp = base.groupBy("p")
      .agg(count(lit(1)).as("cnt"), sum(col("y").cast("long")).as("pos"))
    val w = Window.orderBy("p").rowsBetween(Window.unboundedPreceding, -1)
    val ranked = grp
      .withColumn("cb", coalesce(sum("cnt").over(w), lit(0L)))
      .withColumn("avg_rank",
        col("cb") + (col("cnt") + 1).cast("double") / 2.0)
    val u = ranked.agg(
      sum(col("pos") * col("avg_rank")).as("rank_sum"),
      sum("pos").as("np"),
      sum(col("cnt") - col("pos")).as("nn"))
    val prec = when(col("tp") + col("fp") > 0,
      col("tp").cast("double") / (col("tp") + col("fp"))).otherwise(lit(0.0))
    val rec = when(col("n_pos") > 0,
      col("tp").cast("double") / col("n_pos")).otherwise(lit(0.0))
    conf.crossJoin(u)
      .withColumn("_prec", prec).withColumn("_rec", rec)
      .select(col("n"), col("n_pos"), col("tp"), col("fp"), col("fn"),
        round((col("n") - col("fp") - col("fn")).cast("double") / col("n"), 6)
          .as("accuracy"),
        round(col("_prec"), 6).as("precision"),
        round(col("_rec"), 6).as("recall"),
        round(when(col("_prec") + col("_rec") > 0,
          lit(2.0) * col("_prec") * col("_rec") / (col("_prec") + col("_rec")))
          .otherwise(lit(0.0)), 6).as("f1"),
        when(col("np") > 0 && col("nn") > 0,
          round((col("rank_sum") - col("np") * (col("np") + 1).cast("double") / 2.0)
            / (col("np") * col("nn")), 6)).otherwise(lit(0.5)).as("auc"))
  }
}
