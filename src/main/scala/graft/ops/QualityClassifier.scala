package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality/domain filtering: a logistic-regression
  * classifier over HASHED bag-of-words features — the fastText-style
  * linear text classifier used throughout published LLM data work
  * (GPT-3's LR quality filter over a curated-vs-CommonCrawl label,
  * CCNet/fastText language filtering, Llama's "looks like a
  * reference page" classifier). The heuristic gates ([[TextAnalysis]]
  * Gopher rules) and importance weights (DSIR) live elsewhere; this
  * is the TRAINED discriminative member of the curation family.
  *
  * Scale design (100 TB):
  * - Features are hashed into a FIXED bucket space (the fastText /
  *   DSIR trick): model state is O(buckets), never vocabulary-sized,
  *   and the feature frame is one explode + one map-side-combined
  *   aggregate per doc.
  * - Training is full-batch gradient descent: per iteration ONE
  *   broadcast join of the persisted feature frame against the
  *   O(buckets) weight table and ONE map-side-combined gradient
  *   aggregate whose key space is [0, buckets]; the only driver
  *   state is the weight vector itself (model-sized, the documented
  *   centroids/BPE-vocab contract). Iterations are a driver loop of
  *   small jobs — the [[graft.tree.GradientBoosting]] shape.
  * - Scoring is one broadcast join + one aggregate; the fitted model
  *   also renders to ANSI SQL (weights as a VALUES table), so serving
  *   can run on any engine — and the DuckDB oracle re-scores every
  *   document independently.
  *
  * Determinism (the oracle contract): every floating sum that crosses
  * row order is integerized first — per-(doc, bucket) contributions
  * are rounded to NANO-units and summed as longs (the
  * [[Similarity.marginFromTopK]] round-before-sum discipline), so
  * margins and gradients are exact integers scaled by 1e-9 and the
  * fit is bit-reproducible on any partitioning. The sigmoid only ever
  * runs INSIDE training (Spark-side, one JVM semantics); the rendered
  * scoring surface exposes the raw margin, which is monotone in the
  * probability, so the oracle never has to reproduce `exp` cross-
  * engine.
  */
object QualityClassifier {

  /** Fitted model: weight per feature bucket, plus two reserved
    * slots — index `buckets` is the bias (the classic all-ones
    * pseudo-feature) and index `buckets + 1` is the LENGTH feature
    * (min(tokens, 1000)/100 — capped LINEAR, not log, so the
    * feature is exact integer-ratio arithmetic and the rendered SQL
    * reproduces it bit-for-bit with no cross-engine libm exposure):
    * bucket frequencies are length-normalized, so without an
    * explicit length feature the classifier is blind to document
    * size — and published quality labels (Gopher's token-count rule,
    * "looks like a reference page") are strongly length-correlated.
    */
  case class Model(weights: Array[Double], buckets: Int) {
    def bias: Double = weights(buckets)
    def lengthWeight: Double = weights(buckets + 1)
  }

  /** The shared token→bucket hash — [[TextAnalysis.hashedLmBucket]]'s
    * md5 idiom, ANSI-reproducible on any engine.
    */
  def tokenBucket(tok: Column, buckets: Int): Column =
    pmod(conv(substring(md5(tok), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** The hashed feature frame: (doc_id, y, bkt, x) where x is the
    * doc-relative frequency of the bucket (counts / doc tokens), plus
    * one bias row (bkt = `buckets`, x = 1) and one length row
    * (bkt = `buckets` + 1, x = min(tokens, 1000)/100) per doc — so a
    * margin is exactly one weighted sum. Docs with
    * zero tokens still get their bias row (they score, at the bias,
    * like any other doc; their length row carries x = 0).
    */
  def featureFrame(df: DataFrame, idCol: String, textCol: String,
                   labelCol: Column, buckets: Int): DataFrame = {
    val base = df.select(col(idCol).as("doc_id"),
      labelCol.cast("double").as("y"),
      TextAnalysis.wsTokens(col(textCol)).as("toks"))
    val counts = base
      .select(col("doc_id"), col("y"), explode(col("toks")).as("tok"),
        greatest(size(col("toks")), lit(1)).cast("double").as("n_tok"))
      .groupBy(col("doc_id"), col("y"),
        tokenBucket(col("tok"), buckets).as("bkt"), col("n_tok"))
      .agg((count(lit(1)) / col("n_tok")).as("x"))
      .select("doc_id", "y", "bkt", "x")
    val biasRows = base.select(col("doc_id"), col("y"),
      lit(buckets.toLong).as("bkt"), lit(1.0).as("x"))
    val lenRows = base.select(col("doc_id"), col("y"),
      lit(buckets.toLong + 1L).as("bkt"),
      (least(coalesce(size(col("toks")), lit(0)), lit(1000)).cast("double")
        / 100.0).as("x"))
    counts.unionByName(biasRows).unionByName(lenRows)
  }

  /** Nano-integerized weighted margin per doc over a feature frame
    * joined to a weight table (columns bkt, w): exact on any
    * partitioning.
    */
  private def marginAgg(joined: DataFrame): DataFrame =
    joined.groupBy("doc_id", "y")
      .agg((sum(round(col("x") * col("w") * 1e9).cast("long")) / 1e9).as("m"))

  /** Fit by full-batch gradient descent with Polyak (heavy-ball)
    * momentum: mean logistic-loss gradient, velocity v ← β·v + g,
    * w ← w − lr·v, weights start at 0. Momentum matters here not for
    * fashion but for WALL TIME: each iteration is a driver-loop Spark
    * job with a fixed scheduling/codegen floor, and β = 0.9 reaches
    * in ~12–15 iterations the accuracy plain GD needs 40+ for (the
    * classic condition-number argument — the length feature and the
    * bucket frequencies are badly co-scaled). Fully deterministic:
    * the velocity is driver state updated from the nano-integerized
    * gradient sums.
    */
  def fit(df: DataFrame, idCol: String, textCol: String, labelCol: Column,
          buckets: Int = 512, iters: Int = 25, lr: Double = 5.0,
          momentum: Double = 0.9): Model = {
    require(buckets > 0 && iters > 0 && lr > 0 &&
      momentum >= 0.0 && momentum < 1.0,
      s"bad fit params buckets=$buckets iters=$iters lr=$lr momentum=$momentum")
    val spark = df.sparkSession
    import spark.implicits._
    // pre-partition by doc_id ONCE: every iteration's per-doc margin
    // is then a zero-exchange window over the cached layout, so an
    // iteration costs one cached scan + one O(buckets) reduce — the
    // driver loop never re-shuffles the corpus
    val feat = featureFrame(df, idCol, textCol, labelCol, buckets)
      .repartition(col("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = math.max(1L, feat.filter(col("bkt") === buckets).count())
    val w = new Array[Double](buckets + 2)
    val vel = new Array[Double](buckets + 2)
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    var it = 0
    try {
      while (it < iters) {
        // Dense ARRAY-literal weight lookup (r16, guide §2.4/§4 —
        // was: broadcast-LEFT-join a (bkt, w) frame and coalesce
        // missing to 0). element_at(denseArray, bkt+1) is an O(1)
        // constant-folded lookup that returns exactly the weight the
        // joined-and-coalesced path produced (zero-weight buckets
        // contribute round(x·0·1e9) = 0 to the integerized margin,
        // identical either way), so the fitted weights are
        // bit-identical — while each iteration drops its
        // BroadcastExchange job AND the per-task broadcast-read sync,
        // and the folded array literal lives in the codegen
        // references array, keeping the per-iteration generated
        // source identical (the class stays JIT-warm across
        // iterations). The margin, sigmoid, and per-bucket mean
        // gradient still evaluate in ONE pass over the cached,
        // doc_id-partitioned feature frame (no exchange before the
        // window), nano-integerized.
        val wArr = array(w.map(lit(_)).toIndexedSeq: _*)
        val wv = element_at(wArr, (col("bkt") + 1L).cast("int"))
        val m = sum(round(col("x") * wv * 1e9).cast("long")).over(byDoc) / 1e9
        val p = lit(1.0) / (lit(1.0) + exp(-m))
        val grads = feat
          .select(col("bkt"), col("x"), col("y"), p.as("p"))
          .groupBy("bkt")
          .agg(sum(round((col("p") - col("y")) * col("x") * 1e9).cast("long")).as("gn"))
          .collect()
        val g = new Array[Double](buckets + 2)
        grads.foreach(r => g(r.getLong(0).toInt) = (r.getLong(1) / 1e9) / nDocs)
        var b = 0
        while (b < buckets + 2) {
          vel(b) = momentum * vel(b) + g(b)
          w(b) -= lr * vel(b)
          b += 1
        }
        it += 1
      }
    } finally feat.unpersist()
    Model(w, buckets)
  }

  /** Margin scores for every doc under a fitted model: (doc_id, y,
    * margin). margin > 0 ⇔ p > 0.5. Zero-weight buckets are dropped
    * from the join — a zero weight contributes exactly 0 to the
    * integerized sum, so inner-joining the nonzero weights is EXACT,
    * and every doc keeps its bias row (bias weight always ships).
    */
  def score(df: DataFrame, idCol: String, textCol: String,
            labelCol: Column, model: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val wDf = model.weights.zipWithIndex.collect {
      case (wv, b) if wv != 0.0 || b >= model.buckets => (b.toLong, wv)
    }.toSeq.toDF("bkt", "w")
    val feat = featureFrame(df, idCol, textCol, labelCol, model.buckets)
    marginAgg(feat.join(broadcast(wDf), "bkt"))
      .select(col("doc_id"), col("y"), col("m").as("margin"))
  }

  /** The model's nonzero weights as an ANSI SQL VALUES table literal
    * `(VALUES (bkt, w), ...)` — full-precision doubles (Java's
    * shortest round-trip rendering, which DuckDB parses back to the
    * same IEEE value), bias slot included. With [[tokenBucket]]'s md5
    * idiom this re-scores any document set on any engine.
    */
  def weightsValuesSql(model: Model): String =
    model.weights.zipWithIndex.collect {
      case (wv, b) if wv != 0.0 || b >= model.buckets =>
        // CAST through the string form: Java's Double.toString is the
        // shortest round-trip rendering and DuckDB's CAST parses it to
        // the same IEEE value (a bare decimal literal would land as
        // DECIMAL, not DOUBLE)
        s"($b, CAST('$wv' AS DOUBLE))"
    }.mkString("(VALUES ", ", ", ")")
}
