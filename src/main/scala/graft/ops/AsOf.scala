package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: enrich each left row with the most
  * recent right row of the same key whose timestamp is <= the left
  * timestamp — the standard time-series join Spark lacks natively.
  *
  * Composed from built-ins (preference (a) of the build plan): tag
  * and union both sides, ONE window pass per key ordered by
  * (ts, side, tiebreak) carrying the latest right payload forward
  * with `last(ignoreNulls)`, then keep left rows. Cost: one shuffle
  * on the key + one sort — same as a sort-merge join, with no range
  * explosion, so it scales like any windowed op.
  */
object AsOf {

  /** Left as-of join.
    *
    * @param leftTs / rightTs  event-time columns (same comparable type)
    * @param tieBreak  right column making equal timestamps
    *                  deterministic (e.g. an id)
    * @return all left columns + the right columns prefixed
    *         `right_` (null where no right row precedes)
    */
  def asofJoinLeft(
      left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      tieBreak: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    val rightStruct = struct(right.columns.map(col): _*)
    val rightType = right.schema
    val leftStruct = struct(left.columns.map(col): _*)
    val leftType = left.schema

    val tieBreakType = right.schema(tieBreak).dataType
    val l = left.select(col(key).as("__k"), col(leftTs).as("__t"),
      lit(1).as("__side"), leftStruct.as("__l"),
      lit(null).cast(rightType).as("__r"),
      lit(null).cast(tieBreakType).as("__tb"))
    val r = right.select(col(key).as("__k"), col(rightTs).as("__t"),
      lit(0).as("__side"), lit(null).cast(leftType).as("__l"),
      rightStruct.as("__r"), col(tieBreak).as("__tb"))

    // Right rows sort before left at equal ts (side 0 < 1) => "<=".
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val leftCols = left.columns.map(c => col("__l").getField(c).as(c))
    val rightCols = right.columns.map(c => col("__match").getField(c).as(s"right_$c"))
    joined.select(leftCols ++ rightCols: _*)
  }
}
