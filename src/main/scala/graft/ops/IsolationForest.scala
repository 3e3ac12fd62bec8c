package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Isolation forest (Liu, Ting & Zhou 2008, "Isolation Forest") —
  * the standard unsupervised outlier detector for data-quality
  * triage: anomalies are points that isolate in FEW random splits,
  * so their average path length over an ensemble of random trees is
  * short.
  *
  * Scale shape, Spark-first: the algorithm itself prescribes a TINY
  * per-tree subsample (ψ = 256 in the paper, REGARDLESS of corpus
  * size — isolation depth saturates), so the fit is `numTrees`
  * deterministic hash-ordered top-ψ collects (model-sized by the
  * algorithm's own design, never corpus-sized) plus driver-side
  * recursive builds over ψ rows. The EXPENSIVE part — scoring every
  * row of a 100 TB corpus — is one codegen'd expression: each tree
  * renders as a nested CASE returning its leaf's adjusted path
  * length (depth + c(leafSize), the average-BST-completion term),
  * and the anomaly score is their mean — pure +/CASE arithmetic, so
  * the whole scorer exports to portable SQL and the fitted model is
  * bit-reproducible cross-engine (`scoreSql`).
  *
  * Determinism: subsamples are ordered by `xxhash64(id, tree)` (ties
  * by id), and the per-tree split randomness comes from a
  * `java.util.Random`-compatible seeded sequence — the JDK LCG is
  * specified, so fits reproduce on any JVM.
  */
object IsolationForest {

  sealed trait IsoNode {
    def pathExpr: Column
    def pathSql: String
    def nodes: Int
  }
  final case class IsoLeaf(adjustedDepth: Double) extends IsoNode {
    def pathExpr: Column = lit(adjustedDepth)
    def pathSql: String = s"($adjustedDepth)"
    def nodes: Int = 1
  }
  final case class IsoSplit(attribute: String, threshold: Double,
                            left: IsoNode, right: IsoNode) extends IsoNode {
    def pathExpr: Column =
      when(col(attribute) <= lit(threshold), left.pathExpr)
        .otherwise(right.pathExpr)
    def pathSql: String =
      s"(CASE WHEN $attribute <= $threshold THEN ${left.pathSql}" +
        s" ELSE ${right.pathSql} END)"
    def nodes: Int = 1 + left.nodes + right.nodes
  }

  /** Average unsuccessful-search path length of a BST of n nodes —
    * the paper's c(n) leaf completion term. */
  def cAdjust(n: Long): Double =
    if (n <= 1L) 0.0
    else if (n == 2L) 1.0
    else 2.0 * (math.log(n - 1.0) + 0.5772156649015329) -
      2.0 * (n - 1.0) / n

  final class FittedIsolationForest(val featureColumns: Seq[String],
                                    val trees: Seq[IsoNode],
                                    val psi: Long) {
    /** Mean adjusted path length — SHORT means anomalous. Left-assoc
      * sum over trees, divided once: the association order the SQL
      * render reproduces. */
    def pathLengthExpr: Column =
      trees.map(_.pathExpr).reduce(_ + _) / trees.size.toDouble

    /** The paper's normalized anomaly score 2^(−E[h]/c(ψ)) ∈ (0,1],
      * HIGH means anomalous. Monotone in −pathLengthExpr; serving
      * uses the path length (transcendental-free) and maps to this
      * score only for human-facing output. */
    def anomalyScoreExpr: Column =
      pow(lit(2.0), -pathLengthExpr / lit(cAdjust(psi)))

    def transform(df: DataFrame): DataFrame =
      df.withColumn("path_len", pathLengthExpr)

    /** Portable SQL of the mean path length (the fit-oracle form):
      * (t0 + t1 + …) / k parses left-assoc like the expression. */
    def scoreSql: String =
      trees.map(_.pathSql).mkString("((", " + ", s") / ${trees.size.toDouble})")
  }

  /** Fit: `numTrees` isolation trees, each on a deterministic
    * hash-ordered ψ-row subsample, split depth capped at
    * ceil(log₂ ψ) (the paper's height limit — beyond it everything
    * is "normal-depth" anyway).
    */
  def fit(df: DataFrame, idCol: String, featureColumns: Seq[String],
          numTrees: Int = 6, psi: Int = 128, seed: Long = 42L):
      FittedIsolationForest = {
    require(numTrees >= 1 && psi >= 2)
    val heightCap = math.ceil(math.log(psi.toDouble) / math.log(2.0)).toInt
    val feats = featureColumns
    val base = df.select(col(idCol).as("__id") +:
      feats.map(f => col(f).cast("double")): _*)
    // the per-tree subsample collects are INDEPENDENT top-ψ jobs —
    // run them on driver threads so the numTrees small scans overlap
    // (r16, guide §2.6). Each tree's sample, ordering, and seeded LCG
    // are untouched, and results are kept in tree order, so the
    // fitted forest is identical to the sequential loop's.
    val trees = (0 until numTrees).map { t =>
      scala.concurrent.Future {
      val sample: Array[Array[Double]] = base
        .orderBy(xxhash64(col("__id"), lit(t)), col("__id"))
        .limit(psi)
        .collect()
        .map(r => feats.indices.map(i => r.getDouble(i + 1)).toArray)
      val rng = new java.util.Random(seed * 1000003L + t)
      def build(rows: Array[Array[Double]], depth: Int): IsoNode = {
        if (rows.length <= 1 || depth >= heightCap)
          return IsoLeaf(depth + cAdjust(rows.length))
        // random feature among those with spread; random threshold
        // uniform in (min, max) — the paper's split rule
        val spreads = feats.indices.filter { i =>
          rows.map(_(i)).min < rows.map(_(i)).max
        }
        if (spreads.isEmpty) return IsoLeaf(depth + cAdjust(rows.length))
        val fi = spreads(rng.nextInt(spreads.length))
        val lo = rows.map(_(fi)).min
        val hi = rows.map(_(fi)).max
        val thr = lo + rng.nextDouble() * (hi - lo)
        val (l, r) = rows.partition(_(fi) <= thr)
        if (l.isEmpty || r.isEmpty)  // threshold landed on an edge
          return IsoLeaf(depth + cAdjust(rows.length))
        IsoSplit(feats(fi), thr, build(l, depth + 1), build(r, depth + 1))
      }
      build(sample, 0)
      }(scala.concurrent.ExecutionContext.global)
    }.map(f => scala.concurrent.Await.result(
      f, scala.concurrent.duration.Duration.Inf))
    new FittedIsolationForest(feats, trees, psi.toLong)
  }
}
