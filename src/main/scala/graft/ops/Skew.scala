package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation: two-stage salted aggregate.
  *
  * A plain `groupBy(key)` sends every row of a hot key to one
  * reducer. Salting splits each key into `salt` sub-groups for the
  * partial stage, so the hot key's rows spread over `salt` reducers;
  * the final stage combines the (keys × salt) partials — tiny. Use
  * for heavy-hitter keys where AQE's skew handling doesn't apply
  * (aggregations, not joins).
  */
object Skew {

  /** Supported re-aggregatable functions: name -> (partial, combine). */
  private val combiners: Map[String, (Column => Column, Column => Column)] = Map(
    "sum"   -> ((c => sum(c)), (c => sum(c))),
    "count" -> ((c => count(c)), (c => sum(c))),
    "min"   -> ((c => min(c)), (c => min(c))),
    "max"   -> ((c => max(c)), (c => max(c))))

  /** `aggs`: value column -> function name ("sum"|"count"|"min"|"max").
    * Output columns are named `<fn>_<col>`.
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      aggs: Map[String, String],
      salt: Int = 16): DataFrame = {
    require(aggs.nonEmpty && aggs.values.forall(combiners.contains))
    val saltCol = pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt))
    val partialAggs = aggs.toSeq.map { case (c, fn) =>
      combiners(fn)._1(col(c)).as(s"${fn}_$c")
    }
    val finalAggs = aggs.toSeq.map { case (c, fn) =>
      combiners(fn)._2(col(s"${fn}_$c")).as(s"${fn}_$c")
    }
    df.withColumn("__salt", saltCol)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}
