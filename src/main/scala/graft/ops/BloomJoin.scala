package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction.
  *
  * The classic big-join optimization for the case where the build
  * side's KEY SET fits in a few MB but the rows don't (so a broadcast
  * join is off the table): build a Bloom filter over the right-side
  * keys, broadcast it, and discard non-matching left rows BEFORE the
  * shuffle. The exact semi-join after the prefilter removes the false
  * positives, so the result is exactly the plain semi-join — the
  * bloom only cuts shuffle volume (by ~the selectivity of the join).
  * This mirrors what Spark's runtime row-level filtering does for
  * shuffle joins, exposed as an explicit operator.
  */
object BloomJoin {

  /** Semi-join `left` to the keys of `right`, prefiltred by a bloom
    * filter over the right keys. Result == plain left_semi join.
    *
    * `expectedItems`/`fpp` size the sketch: 1M keys at 3% fpp is
    * ~900 KB — broadcastable even when `right` itself is TBs.
    */
  def bloomSemiJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.03): DataFrame = {
    // Build and probe sides must hash the SAME representation:
    // integral keys go through long insert/probe, everything else
    // through string insert/probe (mixing them — e.g. building over
    // native strings but probing with a cast-to-long — would discard
    // true matches before the "exact" join).
    // stat.bloomFilter NPEs on an empty build side (null agg buffer);
    // the prefilter is an optimization, so fall back to the plain
    // semi-join rather than fail.
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val integral = right.schema(rightKey).dataType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    val buildSide =
      if (integral) right.select(col(rightKey).cast("long").as("k"))
      else right.select(col(rightKey).cast("string").as("k"))
    val prefiltered =
      scala.util.Try(buildSide.stat.bloomFilter("k", expectedItems, fpp)) match {
        case scala.util.Success(bf) =>
          val bc = left.sparkSession.sparkContext.broadcast(bf)
          if (integral) {
            val mc = udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
            left.filter(mc(col(leftKey).cast("long")))
          } else {
            val mc = udf((k: String) => k != null && bc.value.mightContainString(k))
            left.filter(mc(col(leftKey).cast("string")))
          }
        case scala.util.Failure(_) => left
      }
    val keys = right.select(col(rightKey).as(leftKey)).distinct()
    prefiltered.join(keys, Seq(leftKey), "left_semi")
  }
}
