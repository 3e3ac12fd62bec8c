package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable, cross-engine-DETERMINISTIC quantile sketch: an
  * HDR-histogram-style log-bucketed counter table (Tene's
  * HdrHistogram bucket geometry; Masson et al. 2019's DDSketch is the
  * same relative-error-histogram idea) over non-negative longs.
  *
  * Why not KLL/t-digest: both need randomized compaction (KLL coin
  * flips, t-digest data-order-dependent centroids), so two engines —
  * or two partitionings — disagree on the sketch bytes and the
  * estimate, which forbids the house rendered-oracle pattern. The
  * log-histogram has none of that: the bucket of a value is pure
  * integer bit arithmetic, counts are exact integers, MERGE is
  * elementwise add (any order, any partitioning, any engine — one
  * groupBy), and the quantile estimate is a deterministic
  * rank-threshold walk. The price is state O(buckets) ≈
  * mantissaBits·2^m·64 per group (a few hundred rows at m = 5 for
  * long-range values) instead of KLL's O(k log n) — metadata-sized
  * either way, and far below the corpus this summarizes.
  *
  * Guarantee: the estimate for any quantile is the LOWER BOUND of the
  * bucket holding the rank-ceil(q·n) value, so relative error ≤ 2^−m
  * (m mantissa bits) for values ≥ 2^m and EXACT for values < 2^(m+1)
  * (unit-width buckets). Doubles scale to integer micro-units first
  * (the CMS/HLL/margin-mining rule).
  *
  * Lifecycle matches [[Merge.maintainGroupStats]]: `sketch` bootstraps
  * per-group state, `mergeSketches` folds a delta's sketch (or any
  * shard split) in at O(groups·buckets), and `quantiles` reads
  * estimates out — the corpus is scanned once at bootstrap and never
  * again.
  */
object QuantileSketch {

  /** Default mantissa bits: 32 sub-buckets per octave → ≤ 3.1%
    * relative error. */
  val MantissaBits = 5

  /** Bucket index of a non-negative long: values < 2^(m+1) map to
    * themselves (exact unit buckets); above, shift = bitlen(v)−1−m
    * and index = shift·2^m + (v >> shift). Pure integer bit
    * arithmetic — `length(bin(x))` is the bit length on both Spark
    * and DuckDB (the q_padding_waste precedent). Negative values are
    * the caller's contract violation and RAISE — a silent null bucket
    * would sort NULLS FIRST in Spark but NULLS LAST in a DuckDB
    * equivalent, skewing cumulative ranks differently per engine, and
    * lowerBoundOf(null) would read as a null estimate nobody notices.
    * (A null INPUT still maps to a null bucket: null-tolerance is the
    * usual aggregate contract; it's negatives that must fail loudly.)
    */
  def bucketOf(v: Column, m: Int = MantissaBits): Column = {
    val small = 1L << (m + 1)
    val shift = (length(bin(v)) - (1 + m)).cast("int")
    when(v < 0, raise_error(concat(
        lit("QuantileSketch.bucketOf: negative value violates the "
          + "non-negative contract: "), v.cast("string"))).cast("long"))
      .when(v >= 0 && v < small, v)
      .when(v >= small,
        shift.cast("long") * (1L << m)
          + call_function("shiftright", v, shift))
  }

  /** Inclusive lower bound of a bucket — the quantile estimate.
    * Inverse of [[bucketOf]]: index < 2^(m+1) is the value itself;
    * above, shift = (index >> m) − 1 and lb = (index − shift·2^m) <<
    * shift.
    */
  def lowerBoundOf(bucket: Column, m: Int = MantissaBits): Column = {
    val small = 1L << (m + 1)
    val shift = (call_function("shiftright", bucket, lit(m)) - 1L).cast("int")
    when(bucket < small, bucket)
      .otherwise(call_function("shiftleft",
        bucket - shift.cast("long") * (1L << m), shift))
  }

  /** Bootstrap: the per-group sketch table (group, bucket, cnt) —
    * one map-side-combined aggregate over the corpus, O(groups ·
    * buckets) rows out.
    */
  def sketch(df: DataFrame, groupCol: String, valueCol: String,
             m: Int = MantissaBits): DataFrame =
    df.groupBy(col(groupCol),
        bucketOf(col(valueCol).cast("long"), m).as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Fold two sketch tables (state + delta, or any shard split):
    * elementwise add — the merge is exact and order-independent.
    *
    * RETRACTION: counts form a group, not just a monoid, so deletions
    * fold as negative counts — build the tombstone side with
    * [[retraction]] and merge it like any delta; the result is
    * EXACTLY the sketch of the surviving rows (unlike min/max in
    * [[Merge.maintainGroupStats]], which need a rebuild). Buckets
    * that cancel to zero are pruned (state never accretes dead
    * buckets); a bucket going NEGATIVE means the caller retracted
    * values never inserted — that raises here, loudly, because a
    * silently-negative count would skew every later rank walk.
    */
  def mergeSketches(a: DataFrame, b: DataFrame,
                    groupCol: String): DataFrame =
    a.unionByName(b)
      .groupBy(col(groupCol), col("bucket"))
      .agg(sum("cnt").as("cnt"))
      .filter(col("cnt") =!= 0L)
      .select(col(groupCol), col("bucket"),
        when(col("cnt") < 0L, raise_error(concat(
            lit("QuantileSketch.mergeSketches: bucket count went "
              + "negative (retraction of values never inserted): "),
            col("cnt").cast("string"))).cast("long"))
          .otherwise(col("cnt")).as("cnt"))

  /** The tombstone sketch of deleted rows: [[sketch]] with negated
    * counts, ready to [[mergeSketches]] into the maintained state.
    */
  def retraction(df: DataFrame, groupCol: String, valueCol: String,
                 m: Int = MantissaBits): DataFrame =
    sketch(df, groupCol, valueCol, m)
      .select(col(groupCol), col("bucket"), (-col("cnt")).as("cnt"))

  /** Per-group MEDIAN ABSOLUTE DEVIATION by sketch composition — the
    * robust spread statistic (outlier-insensitive, unlike the
    * (n,s,s2) variance) a curation dashboard wants next to p50/p95:
    * pass 1 sketches values and reads the per-group median estimate;
    * pass 2 sketches |v − median| and reads ITS median. Both passes
    * are sketch-bounded scans; the per-group medians broadcast back
    * (groups-sized). All arithmetic stays integer (|long − long|), so
    * the composed estimate is bit-identical cross-engine like the
    * single-pass quantiles. Output (group, n, median_est, mad_est).
    */
  def groupMad(df: DataFrame, groupCol: String, valueCol: String,
               m: Int = MantissaBits): DataFrame = {
    val med = quantiles(sketch(df, groupCol, valueCol, m),
        groupCol, Seq((1, 2)), m)
      .select(col(groupCol), col("n"), col("est").as("median_est"))
    val dev = df.join(broadcast(med), groupCol)
      .select(col(groupCol),
        abs(col(valueCol).cast("long") - col("median_est")).as("_dev"))
    quantiles(sketch(dev, groupCol, "_dev", m), groupCol, Seq((1, 2)), m)
      .select(col(groupCol), col("est").as("mad_est"))
      .join(broadcast(med), groupCol)
      .select(col(groupCol), col("n"), col("median_est"), col("mad_est"))
  }

  /** Quantile estimates from a sketch: for each (num, den) quantile
    * the lower bound of the bucket where the cumulative count first
    * reaches rank ceil(num·n/den) — integer rank arithmetic
    * (floorDiv(num·n + den − 1, den)), never a double in sight, so
    * the walk is bit-identical cross-engine. Output (group, q_num,
    * q_den, n, est). Cost: one window over the groups·buckets-sized
    * sketch — never the corpus.
    */
  def quantiles(sk: DataFrame, groupCol: String,
                qs: Seq[(Int, Int)],
                m: Int = MantissaBits): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol).orderBy("bucket")
    val cum = sk
      .withColumn("cum", sum("cnt").over(w))
      .withColumn("n", sum("cnt").over(Window.partitionBy(groupCol)))
    val perQ = qs.map { case (num, den) =>
      require(num > 0 && den > 0 && num <= den, s"bad quantile $num/$den")
      // ceil-div in INTEGER arithmetic: `/` on Columns is double
      // division (a 23.4 "rank" would overshoot buckets and a rank
      // above n would drop the group entirely) — IntegralDivide only.
      val rank = call_function("div", col("n") * num + (den - 1), lit(den))
      cum.filter(col("cum") >= rank)
        .groupBy(col(groupCol))
        .agg(min("bucket").as("bucket"), first("n").as("n"))
        .select(col(groupCol), lit(num).as("q_num"), lit(den).as("q_den"),
          col("n"), lowerBoundOf(col("bucket"), m).as("est"))
    }
    perQ.reduce(_.unionByName(_))
  }
}
