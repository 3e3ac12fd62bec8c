package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-column utilities for training-data pipelines: L2
  * normalization and symmetric int8 quantization.
  *
  * Everything is a pure `Column` expression over `array<double>`
  * (cast float embeddings up first — float arithmetic is not
  * reproducible across engines, double is), so the operators run
  * inside a single projection with no shuffle: at 100 TB these are
  * embarrassingly parallel map work.
  */
object Embeddings {

  /** Cast an array<float> embedding to array<double> for
    * deterministic arithmetic.
    */
  def toDouble(vec: Column): Column = vec.cast("array<double>")

  /** L2 norm via one fold. */
  def l2Norm(vec: Column): Column =
    sqrt(aggregate(vec, lit(0.0), (a, x) => a + x * x))

  /** Unit-normalized copy (zero vectors pass through unchanged). */
  def normalized(vec: Column): Column = {
    val n = l2Norm(vec)
    when(n === 0.0, vec).otherwise(transform(vec, x => x / n))
  }

  /** Symmetric int8 quantization: scale = 127 / max|x| per vector;
    * q_i = floor(x_i·scale + 0.5). The explicit floor(+0.5) rounding
    * (not `round`) is deliberate: it is bit-identical across engines,
    * where half-even vs half-away `round` implementations differ.
    * |x·scale| ≤ 127 by construction, so values stay in [-127, 127].
    * Zero vectors quantize to zeros (scale guard).
    */
  def quantScale(vec: Column): Column = {
    val maxAbs = array_max(transform(vec, x => abs(x)))
    when(maxAbs === 0.0, 1.0).otherwise(lit(127.0) / maxAbs)
  }

  def quantizeInt8(vec: Column, scale: Column): Column =
    transform(vec, x => floor(x * scale + 0.5).cast("long"))

  /** Dequantized reconstruction. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, qi => qi.cast("double") / scale)

  /** Mean squared reconstruction error of quantize→dequantize. */
  def quantMse(vec: Column, scale: Column): Column = {
    val dq = dequantize(quantizeInt8(vec, scale), scale)
    aggregate(zip_with(vec, dq, (x, y) => (x - y) * (x - y)),
      lit(0.0), (a, e) => a + e) / size(vec)
  }

  /** Population covariance matrix of a vector column — the input to
    * whitening, embedding-drift monitoring, and PCA-style analysis.
    * Output: one row per upper-triangle entry (i ≤ j): (i, j, cov).
    *
    * Scale: ONE pass with the [[graft.functions.VectorMoments]]
    * bounded aggregate — d + d(d+1)/2 doubles of state per partition,
    * map-side combined, so the shuffle is O(partitions × d²) bytes
    * regardless of corpus size (the explode-and-self-join form
    * shuffles O(rows × d²) values). 64-dim ⇒ ~17 KB per partition.
    */
  def covarianceMatrix(df: org.apache.spark.sql.DataFrame,
                       vecCol: String): org.apache.spark.sql.DataFrame =
    df.agg(graft.functions.Native.vectorMoments(col(vecCol)).as("_m"))
      .select(explode(col("_m.pairs")).as("_p"))
      .select(col("_p.i").as("i"), col("_p.j").as("j"), col("_p.cov").as("cov"))

  /** Per-dimension corpus mean from the same single-pass moments. */
  def meanVector(df: org.apache.spark.sql.DataFrame,
                 vecCol: String): org.apache.spark.sql.DataFrame =
    df.agg(graft.functions.Native.vectorMoments(col(vecCol)).as("_m"))
      .select(posexplode(col("_m.means")).as(Seq("i", "mean")))
}
