package graft.tree

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Random-forest ensemble over the level-wise distributed tree
  * learner — the quality-classifier shape training-data pipelines
  * actually deploy (bagged trees voting on document keep/drop).
  *
  * Determinism by construction (so fits are reproducible and
  * oracle-checkable):
  *  - row bagging hashes the FEATURE VALUES (xxhash64 seeded by the
  *    tree index) — stable under any partitioning, unlike
  *    monotonically_increasing_id;
  *  - feature bagging rotates a deterministic window over the
  *    feature list per tree.
  *
  * Prediction is majority vote: the sum of the per-tree codegen'd
  * when-chains compared to numTrees/2 — still ONE whole-stage-codegen
  * pass over the data, no shuffle.
  */
class RandomForest(
    val params: DecisionTreeParams,
    val numTrees: Int,
    val featureSubsetSize: Int = 0,
    val bagFraction: Double = 0.7,
    val seed: Long = 42L,
    val categoricalColumns: Seq[String] = Seq.empty) {

  require(numTrees >= 1)

  private def featuresFor(tree: Int): Seq[String] = {
    val all = params.featureColumns
    val m = if (featureSubsetSize <= 0) all.size else math.min(featureSubsetSize, all.size)
    (0 until m).map(j => all(math.floorMod(tree + seed + j, all.size).toInt)).distinct
  }

  /** Per-tree categorical subset (the k-ary forest's rotation). */
  private def catsFor(tree: Int): Seq[String] = {
    val all = categoricalColumns
    if (all.isEmpty) Seq.empty
    else {
      val m = if (featureSubsetSize <= 0) all.size
              else math.min(featureSubsetSize, all.size)
      (0 until m).map(j => all(math.floorMod(tree + seed + j, all.size).toInt)).distinct
    }
  }

  /** Deterministic per-tree row bag: hash of the feature values
    * (categorical columns join the hash; with none the bags are
    * bit-identical to the pre-categorical forest's). */
  private[tree] def bagFilter(tree: Int): Column = {
    val h = xxhash64((lit(seed) +: lit(tree) +:
      (params.featureColumns ++ categoricalColumns).map(col)): _*)
    pmod(h, lit(1000L)) < lit((bagFraction * 1000).toLong)
  }

  /** Fused level-wise forest fit: ONE pair of aggregate passes per
    * LEVEL for the whole ensemble, not per tree. Every row explodes
    * into its (tree, node) memberships (bag filters applied inside
    * the explode), and a single groupBy(tree, node) aggregate
    * computes all trees' node stats simultaneously — so the job count
    * is O(depth), independent of ensemble size, and the shuffle
    * carries O(trees × nodes × features) scalars. Produces trees
    * IDENTICAL to fitting each one with DecisionTree.fit (spec-checked
    * against the sequential path).
    */
  def fit(dataset: DataFrame): FittedRandomForest = {
    val work = FitInternals.rightSizeForRepeatedScans(dataset.select(
      (params.featureColumns ++ categoricalColumns :+ params.classColumn)
        .distinct.map(col): _*))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try fitFusedOn(work)
    finally { work.unpersist(blocking = false); () }
  }

  /** The straightforward tree-at-a-time fit (kept as the reference
    * implementation the fused fit is verified against).
    */
  private[tree] def fitSequential(dataset: DataFrame): FittedRandomForest = {
    val work = FitInternals.rightSizeForRepeatedScans(dataset.select(
      (params.featureColumns ++ categoricalColumns :+ params.classColumn)
        .distinct.map(col): _*))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val trees = (0 until numTrees).map { i =>
        val treeParams = params.copy(featureColumns = featuresFor(i))
        new DecisionTree(treeParams, catsFor(i))
          .fitCached(work.filter(bagFilter(i)))
      }
      new FittedRandomForest(this, trees)
    } finally { work.unpersist(blocking = false); () }
  }

  private def fitFusedOn(dataset: DataFrame): FittedRandomForest = {
    import FitInternals.{MaxLevels, NodeStats}
    import scala.collection.mutable
    val features = params.featureColumns
    val catFeatures = categoricalColumns
    val clsCol = col(params.classColumn).cast("double")
    val metric = params.metric
    val method = params.method
    val treeFeatures = (0 until numTrees).map(featuresFor)
    val treeCats = (0 until numTrees).map(catsFor)
    require(catFeatures.isEmpty || features.isEmpty || method == MeanSplitter,
      "categorical splits in the sequential-parity path compose child " +
        s"thresholds from sums; use the mean splitter (got ${params.splittingMethod})")
    // the k-ary forests' fit-time contracts, verbatim (r12): NULL
    // categoricals rejected (fused recomputes child stats over routed
    // rows, sequential composes from per-category cells; parity is
    // exact on null-free, integer-valued-numeric fixtures)
    if (catFeatures.nonEmpty) {
      val nullAggs = catFeatures.map(q =>
        count(when(col(q).isNull, lit(1))).as(s"nn_$q"))
      val nulls = dataset.agg(nullAggs.head, nullAggs.tail: _*).collect()(0)
      catFeatures.zipWithIndex.foreach { case (q, i) =>
        require(nulls.getLong(i) == 0L,
          s"categorical feature $q has ${nulls.getLong(i)} NULL rows; " +
            "fit requires non-null categorical columns (impute a " +
            "sentinel category upstream)")
      }
    }
    val catDict: Map[String, Seq[String]] = catFeatures.map { q =>
      val vs = dataset.select(col(q).cast("string").as("v"))
        .filter(col("v").isNotNull).distinct()
        .collect().map(_.getString(0)).sorted.toSeq
      require(vs.size <= 64,
        s"categorical feature $q has ${vs.size} values; cap is 64")
      q -> vs
    }.toMap

    val splits = Array.fill(numTrees)(mutable.Map.empty[Long, SplitParams])
    val catSplits =
      Array.fill(numTrees)(mutable.Map.empty[Long, (String, Seq[String])])
    val leaves = Array.fill(numTrees)(mutable.Map.empty[Long, Int])
    val majorities = Array.fill(numTrees)(mutable.Map.empty[Long, Int])
    val p1s = Array.fill(numTrees)(mutable.Map.empty[Long, Double])

    def nodeIdExpr(tree: Int, id: Long): Column = splits(tree).get(id) match {
      case Some(s) =>
        when(col(s.attribute) <= lit(s.threshold), nodeIdExpr(tree, 2 * id))
          .otherwise(nodeIdExpr(tree, 2 * id + 1))
      case None => catSplits(tree).get(id) match {
        case Some((a, vs)) =>
          when(col(a).cast("string").isin(vs: _*), nodeIdExpr(tree, 2 * id))
            .otherwise(nodeIdExpr(tree, 2 * id + 1))
        case None => lit(id)
      }
    }

    /** Each row's (tree, node) memberships; rows outside a tree's bag
      * get node = -1 and are dropped after the explode (cheaper than a
      * filter() HOF allocating a second array per row).
      */
    def membership: Column =
      array((0 until numTrees).map { i =>
        struct(lit(i).as("t"),
          when(bagFilter(i), nodeIdExpr(i, 1L)).otherwise(lit(-1L)).as("node"))
      }: _*)

    val open = Array.fill(numTrees)(Seq(1L))
    var depth = 0

    while (open.exists(_.nonEmpty) && depth < MaxLevels) {
      // Pass 1: per-(tree, node) count, p1, and per-feature thresholds.
      val statAggs =
        count(lit(1)).as("n") +:
        avg(clsCol).as("p1") +:
        features.map(f => method.thresholdExpr(col(f).cast("double")).as(s"thr_$f"))
      val statRows = dataset
        .select(col("*"), explode(membership).as("e"))
        .select(col("*"), col("e.t").as("t"), col("e.node").as("node"))
        .where(col("node") >= 0)
        .groupBy("t", "node")
        .agg(statAggs.head, statAggs.tail: _*)
        .collect()
        .map { r =>
          val thr = features.zipWithIndex.map { case (f, i) =>
            val v = r.get(4 + i) // layout: t, node, n, p1, thr_0, ...
            f -> (if (v == null) Double.NaN else v.asInstanceOf[Number].doubleValue())
          }.toMap
          (r.getInt(0), r.getLong(1)) -> NodeStats(r.getLong(2).toDouble, r.getDouble(3), thr)
        }.toMap

      // Per-tree stopping rules — identical to DecisionTree.fitOn.
      val toSplit = mutable.Buffer.empty[(Int, Long, NodeStats)]
      (0 until numTrees).foreach { i =>
        val openStats = open(i).flatMap(id => statRows.get((i, id)).map(id -> _))
        openStats.foreach { case (id, st) =>
          majorities(i)(id) = st.majority
          p1s(i)(id) = st.p1
        }
        val (sp, lf) = openStats.partition { case (_, st) =>
          FitInternals.shouldSplit(st, params, depth)
        }
        lf.foreach { case (id, st) => leaves(i)(id) = st.majority }
        open(i).filterNot(id => statRows.contains((i, id)))
          .foreach(id => leaves(i)(id) = 0)
        sp.foreach { case (id, st) => toSplit += ((i, id, st)) }
      }

      if (toSplit.nonEmpty) {
        // Pass 2: per-(tree, node, feature) split stats. Candidate
        // threshold dispatch per (tree, node) via FitInternals (O(1)
        // constant-array lookup at shallow levels — a when-chain here
        // costs O(trees × nodes) per row and measured 2x slower —
        // falling back to the chain past the array-size bound).
        def thrExpr(f: String): Column =
          FitInternals.levelThresholdExprForest(
            toSplit.map { case (i, id, st) => (i, id, st.thresholds(f)) }.toSeq,
            depth, numTrees)
        // Per-row PRE-PROJECTION of the side booleans (r17 — the r16
        // RegressionTree factoring ported to the fused forest, guide
        // §4): the per-(tree, node) threshold dispatch CASE used to
        // re-evaluate inside all four aggregates of every feature —
        // over the ×numTrees exploded membership rows. Each side
        // boolean is now computed once per exploded row in a
        // projection under the aggregate. Same IEEE comparisons over
        // the same rows, merely factored.
        val activePre = mutable.LinkedHashMap.empty[String, Column]
        def pv(nm: String, c: => Column): Column = {
          activePre.getOrElseUpdate(nm, c); col(nm)
        }
        val splitAggs = features.flatMap { f =>
          val fc = col(f).cast("double")
          val le = pv(s"__pv_le_$f", fc <= thrExpr(f))
          val gt = pv(s"__pv_gt_$f", fc > thrExpr(f))
          Seq(
            avg(when(le, clsCol)).as(s"lp1_$f"),
            avg(when(gt, clsCol)).as(s"rp1_$f"),
            count(when(le, lit(1))).as(s"ln_$f"),
            count(when(gt, lit(1))).as(s"rn_$f"))
        } ++
        // categorical cells (the k-ary forest layout at k = 2): per
        // (feature, category) class-1 sum + count; prefix splits
        // score driver-side, child stats recompute next level
        catFeatures.zipWithIndex.flatMap { case (q, qi) =>
          val qc = col(q).cast("string")
          catDict(q).zipWithIndex.flatMap { case (v, vi) =>
            val in = pv(s"__pv_in_${qi}_$vi", qc === v)
            Seq(
              sum(when(in, clsCol)).as(s"qs_${qi}_$vi"),
              count(when(in, lit(1))).as(s"qn_${qi}_$vi"))
          }
        }
        val exploded = dataset
          .select(col("*"), explode(membership).as("e"))
          .select(col("*"), col("e.t").as("t"), col("e.node").as("node"))
          .where(col("node") >= 0)
        val splitRows = exploded
          .select(col("*") +:
            activePre.map { case (n, c) => c.as(n) }.toSeq: _*)
          .groupBy("t", "node")
          .agg(splitAggs.head, splitAggs.tail: _*)
          .collect()
          .map(r => (r.getInt(0), r.getLong(1)) -> r)
          .toMap

        val nextOpen = Array.fill(numTrees)(mutable.Buffer.empty[Long])
        toSplit.foreach { case (i, id, st) =>
          val row = splitRows((i, id))
          def cell(nm: String): Any = row.get(row.fieldIndex(nm))
          def numOr(v: Any, d: Double): Double =
            if (v == null) d else v.asInstanceOf[Number].doubleValue()
          // unified candidates under the REFERENCE objective and
          // leaf-if-degenerate-best rule — the exact DecisionTree
          // scorer, per tree subset (parity contract)
          case class Cand(name: String, choice: Either[Double, Seq[String]],
                          ln: Long, rn: Long, m: Double, degenerate: Boolean)
          val scoredFeatures = treeFeatures(i).sorted.map { f =>
            val lp1 = numOr(cell(s"lp1_$f"), 0.0)
            val rp1 = numOr(cell(s"rp1_$f"), 0.0)
            val ln = row.getLong(row.fieldIndex(s"ln_$f"))
            val rn = row.getLong(row.fieldIndex(s"rn_$f"))
            val m = metric.evalFromP1(lp1) + metric.evalFromP1(rp1)
            Cand(f, Left(st.thresholds(f)), ln, rn, if (m.isNaN) 0.0 else m,
              degenerate = math.min(ln, rn) == 0L || st.thresholds(f).isNaN)
          }
          val scoredCats = treeCats(i).flatMap { q =>
            val qi = catFeatures.indexOf(q)
            val perCat = catDict(q).zipWithIndex.map { case (v, vi) =>
              (v, row.getLong(row.fieldIndex(s"qn_${qi}_$vi")),
                numOr(cell(s"qs_${qi}_$vi"), 0.0))
            }.filter(_._2 > 0L)
            if (perCat.size < 2) None
            else {
              val ordered = perCat.sortBy { case (v, n, sm) => (sm / n, v) }
              val bounds = (1 until ordered.size).map { b =>
                val (lf, rt) = ordered.splitAt(b)
                val ln = lf.map(_._2).sum; val rn = rt.map(_._2).sum
                val lp1 = lf.map(_._3).sum / ln
                val rp1 = rt.map(_._3).sum / rn
                val m = metric.evalFromP1(lp1) + metric.evalFromP1(rp1)
                (lf.map(_._1), ln, rn, if (m.isNaN) 0.0 else m, b)
              }
              val bb =
                if (metric.seekMinimum) bounds.minBy(t => (t._4, t._5))
                else bounds.minBy(t => (-t._4, t._5))
              Some(Cand(q, Right(bb._1), bb._2, bb._3, bb._4,
                degenerate = false))
            }
          }
          // Lockstep with DecisionTree's rule (r12 advice): numeric-only
          // trees keep the reference leaf-if-degenerate-best semantics;
          // a tree that ALSO draws categorical candidates filters
          // degenerate numerics before the argmin so a constant/all-null
          // feature can't suppress a gainful IN-set split.
          val allCands = scoredFeatures ++ scoredCats
          val cands =
            (if (treeCats(i).isEmpty) allCands
             else allCands.filterNot(_.degenerate)).sortBy(_.name)
          val bestOpt =
            if (cands.isEmpty) None
            else Some(
              if (metric.seekMinimum) cands.minBy(c => (c.m, c.name))
              else cands.minBy(c => (-c.m, c.name)))
          if (bestOpt.isEmpty || bestOpt.get.degenerate) {
            leaves(i)(id) = st.majority
          } else bestOpt.get.choice match {
            case Left(bt) =>
              splits(i)(id) = SplitParams(bestOpt.get.name, bt)
              nextOpen(i) += 2 * id
              nextOpen(i) += 2 * id + 1
            case Right(leftSet) =>
              catSplits(i)(id) = (bestOpt.get.name, leftSet)
              nextOpen(i) += 2 * id
              nextOpen(i) += 2 * id + 1
          }
        }
        (0 until numTrees).foreach(i => open(i) = nextOpen(i).toSeq)
      } else {
        (0 until numTrees).foreach(i => open(i) = Seq.empty)
      }
      depth += 1
    }

    val trees = (0 until numTrees).map { i =>
      def ancestorMajority(id: Long): Int = {
        var cur = id
        while (cur >= 1 && !majorities(i).contains(cur)) cur /= 2
        majorities(i).getOrElse(cur, 0)
      }
      open(i).foreach(id => leaves(i)(id) = ancestorMajority(id))
      def build(id: Long): TreeNode = splits(i).get(id) match {
        case Some(s) =>
          DecisionNode(s.attribute, s.threshold, build(2 * id), build(2 * id + 1))
        case None => catSplits(i).get(id) match {
          case Some((a, vs)) =>
            CatDecisionNode(a, vs, build(2 * id), build(2 * id + 1))
          case None =>
            LeafNode(leaves(i).getOrElse(id, majorities(i).getOrElse(id, 0)),
              params.classColumn)
        }
      }
      new FittedDecisionTree(params.copy(featureColumns = treeFeatures(i)), build(1L),
        nodeSplits = splits(i).toMap, nodeP1 = p1s(i).toMap,
        nodeCatSplits = catSplits(i).toMap)
    }
    new FittedRandomForest(this, trees)
  }
}

final class FittedRandomForest(
    val forest: RandomForest,
    val trees: Seq[FittedDecisionTree]) {

  /** Majority vote as a single codegen'd expression. */
  def predictionExpr: Column = {
    val votes = trees.map(_.root.predictionExpr.cast("int")).reduce(_ + _)
    (votes * 2 > trees.size).cast("int")
  }

  def transform(samples: DataFrame): DataFrame =
    samples.withColumn("prediction", predictionExpr)

  /** OUT-OF-BAG error estimate (r12) — the forest's free validation:
    * because the bags are DETERMINISTIC expressions over the feature
    * values, each training row's out-of-bag trees are recomputable at
    * evaluation time, so the whole estimate is ONE codegen'd pass +
    * one tiny aggregate (no second fit, no held-out split, no
    * materialized bag table). A row votes only among trees whose bag
    * EXCLUDES it; an exact OOB vote tie resolves to 0, the same
    * strict-majority convention as predictionExpr's votes*2 >
    * trees.size. Rows in every bag are excluded from the rate.
    * Returns (oob_error, n_oob_rows).
    */
  def oobError(dataset: DataFrame): (Double, Long) = {
    val label = col(forest.params.classColumn).cast("int")
    val oobVotes = trees.indices.map { i =>
      when(!forest.bagFilter(i),
        trees(i).root.predictionExpr.cast("int")).otherwise(lit(0))
    }.reduce(_ + _)
    val nOob = trees.indices.map { i =>
      when(!forest.bagFilter(i), 1).otherwise(0)
    }.reduce(_ + _)
    val pred = (oobVotes * 2 > nOob).cast("int")
    val row = dataset
      .select(label.as("y"), pred.as("p"), nOob.as("n"))
      .filter(col("n") > 0)
      .agg(avg((col("y") =!= col("p")).cast("double")).as("err"),
        count(lit(1)).as("n"))
      .collect()(0)
    (if (row.isNullAt(0)) 0.0 else row.getDouble(0), row.getLong(1))
  }

  def toJValue: JValue = JObject(
    "num_trees" -> JInt(trees.size),
    "trees" -> JArray(trees.map(_.toJValue).toList))

  def json(indent: Option[Int] = None): String = indent match {
    case Some(_) => JsonMethods.pretty(JsonMethods.render(toJValue))
    case None    => JsonMethods.compact(JsonMethods.render(toJValue))
  }
}

object FittedRandomForest {
  def fromJson(s: String, forest: RandomForest): FittedRandomForest = {
    val JObject(fields) = JsonMethods.parse(s): @unchecked
    val JArray(treeJs) = fields.toMap.apply("trees"): @unchecked
    new FittedRandomForest(forest, treeJs.map(FittedDecisionTree.fromJValue))
  }
}
