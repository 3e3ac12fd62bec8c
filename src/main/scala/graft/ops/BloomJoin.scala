package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

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
    //
    // Build and probe are both CATALYST expressions (no UDF): the
    // build side folds xxhash64(rep) longs into Spark's own
    // `BloomFilterAggregate` (partial aggregation merges per-partition
    // filters, one ~`numBits/8`-byte binary reaches the driver — a
    // model-sized collect); the probe is Spark's codegen'd
    // `BloomFilterMightContain` over those bytes as a plan literal
    // (exactly how AQE's injected runtime filters ship theirs), so
    // the prefilter runs INSIDE whole-stage codegen with the
    // deserialized filter cached as a codegen reference object —
    // the per-row boxing/dispatch of the former Scala UDF is gone.
    // An EMPTY build side aggregates to a NULL binary; the prefilter
    // is an optimization, so fall back to the plain semi-join there.
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
      case Some(_) =>
        val numBits = org.apache.spark.util.sketch.BloomFilter
          .optimalNumOfBits(expectedItems, fpp)
        val buildAgg = GraftBridge.column(new BloomFilterAggregate(
            GraftBridge.expression(xxhash64(rep(col(rightKey)))),
            Literal(expectedItems), Literal(numBits))
          .toAggregateExpression())
        val bytes = right.agg(buildAgg.as("bf")).collect()(0).get(0)
        if (bytes == null) left
        else left.filter(GraftBridge.column(BloomFilterMightContain(
          Literal(bytes, BinaryType),
          GraftBridge.expression(xxhash64(rep(col(leftKey)))))))
    }
    val keys = right.select(col(rightKey).as(leftKey)).distinct()
    prefiltered.join(keys, Seq(leftKey), "left_semi")
  }
}
