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
    // Build and probe must hash the SAME representation, chosen from
    // BOTH key types: two integral keys hash as longs; two numeric
    // keys (either fractional) cast to double on BOTH sides before
    // the string hash, so 5L and 5.0 render identically; mixed
    // numeric/non-numeric kinds skip the bloom entirely (the exact
    // semi-join below decides under Spark's own coercion) — any
    // representation mismatch here silently discards true matches.
    // stat.bloomFilter NPEs on an empty build side (null agg buffer);
    // the prefilter is an optimization, so fall back to the plain
    // semi-join rather than fail.
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, NumericType, ShortType}
    def isIntegral(dt: org.apache.spark.sql.types.DataType) = dt match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    val lt = left.schema(leftKey).dataType
    val rt = right.schema(rightKey).dataType
    val (lNum, rNum) = (lt.isInstanceOf[NumericType], rt.isInstanceOf[NumericType])
    val mode: Option[String] =
      if (isIntegral(lt) && isIntegral(rt)) Some("long")
      else if (lNum && rNum) Some("double")
      else if (!lNum && !rNum) Some("string")
      else None // mixed kinds: no safe common hash, skip the prefilter
    def rep(c: Column): Column = mode match {
      case Some("long")   => c.cast("long")
      case Some("double") => c.cast("double").cast("string")
      case _              => c.cast("string")
    }
    val prefiltered = mode match {
      case None => left
      case Some(m) =>
        scala.util.Try(
          right.select(rep(col(rightKey)).as("k")).stat.bloomFilter("k", expectedItems, fpp)
        ) match {
          case scala.util.Success(bf) =>
            val bc = left.sparkSession.sparkContext.broadcast(bf)
            if (m == "long") {
              val mc = udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
              left.filter(mc(rep(col(leftKey))))
            } else {
              val mc = udf((k: String) => k != null && bc.value.mightContainString(k))
              left.filter(mc(rep(col(leftKey))))
            }
          case scala.util.Failure(_) => left
        }
    }
    val keys = right.select(col(rightKey).as(leftKey)).distinct()
    prefiltered.join(keys, Seq(leftKey), "left_semi")
  }
}
