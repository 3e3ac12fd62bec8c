package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation and joins via salting.
  *
  * A plain `groupBy(key)` (or shuffle join) sends every row of a hot
  * key to one reducer. Salting splits each key into `salt` sub-groups
  * so the hot key's rows spread over `salt` reducers.
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

  /** Skew-resistant INNER equi-join: each fact row gets a salt in
    * [0, salt), the dimension side is replicated `salt` times, and
    * the join key becomes (key, salt) — a hot fact key's rows spread
    * over `salt` reducers instead of landing on one. The result is
    * exactly the plain inner join (both sides must expose the key
    * under the same column name). Shuffle cost: fact unchanged, dim
    * × salt. Prefer `broadcast(dim)` when dim fits in memory and
    * AQE's skew-join when its thresholds trigger; this is the manual
    * fallback between those regimes — dim too big to broadcast, skew
    * too concentrated for AQE's partition splitting (a single
    * oversized KEY, not just an oversized partition).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salt: Int = 16): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    val f = fact.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)).cast("int"))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    f.join(d, Seq(key, "__salt")).drop("__salt")
  }
}
