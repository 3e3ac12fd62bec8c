package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized range (interval) join.
  *
  * Spark has no native range-join optimization: a plain
  * `a.join(b, b.ts between ...)` plans as BroadcastNestedLoopJoin —
  * O(|a|·|b|) and a driver OOM once neither side broadcasts. The
  * scale path is the classic bucketization: quantize time into
  * buckets the width of the query window, equi-join on the bucket id
  * (a normal shuffled hash join), and post-filter the exact range.
  * Each right row lands in exactly ONE bucket and each left row
  * probes the ≤2 buckets its window can overlap, so matches are
  * found exactly once — no distinct needed — and the join carries
  * uniform hash keys at any scale.
  */
object RangeJoin {

  /** For each left row, count right rows whose `rightTs` falls in
    * `(leftTs - windowSec, leftTs]`. Left rows with no match get 0.
    * Output: all `left` columns + `n_in_range`.
    *
    * `leftId` must uniquely identify left rows: counts are aggregated
    * by it and rejoined, so duplicate ids would merge their windows'
    * counts (each duplicate row receiving the combined total).
    */
  def rangeCount(
      left: DataFrame,
      right: DataFrame,
      leftId: String,
      leftTs: String,
      rightTs: String,
      windowSec: Long): DataFrame = {
    val w = windowSec * 1000000L // micros
    val l = left
      .withColumn("_lus", unix_micros(col(leftTs)))
      .withColumn("_bucket",
        explode(array_distinct(array(
          floor((col("_lus") - w) / w), floor(col("_lus") / w)))))
    val r = right
      .withColumn("_rus", unix_micros(col(rightTs)))
      .withColumn("_bucket", floor(col("_rus") / w))
      .select("_bucket", "_rus")
    val counts = l.join(r, "_bucket")
      .filter(col("_rus") > col("_lus") - w && col("_rus") <= col("_lus"))
      .groupBy(leftId)
      .agg(count(lit(1)).as("n_in_range"))
    left.join(counts, Seq(leftId), "left")
      .na.fill(0L, Seq("n_in_range"))
  }
}
