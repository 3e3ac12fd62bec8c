package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Marketing-style touch attribution over an event stream: for every
  * conversion event, find the user's FIRST and most recent (LAST)
  * preceding touch event — the primitive behind first-touch /
  * last-touch / lookback-window attribution reports, and a close
  * cousin of provenance questions on corpus events ("which ingest
  * touched this doc last before the quality flag flipped?").
  *
  * Scale: one shuffle on the user key, then per-user ordered window
  * frames — the sessionization shape. Frames are ROWS/RANGE …
  * PRECEDING, so Spark evaluates them streaming per partition
  * without materializing a per-user buffer larger than the frame
  * bookkeeping. No self-join: the naive "join conversions × touches
  * then pick min/max" pairs every conversion with every touch of the
  * same user (quadratic in events-per-user, skew-fatal for a
  * heavy user); the window form is linear after the sort.
  */
object Attribution {

  /** Per-conversion first/last preceding touch.
    *
    * Output: one row per conversion event — (idCol, userCol, tsCol,
    * first_touch, last_touch), the touch columns holding the
    * attributed touch events' ids (null when the user has no touch
    * strictly before the conversion; "before" = (ts, id) ascending,
    * so same-timestamp ordering is deterministic by id).
    */
  def firstLastTouch(events: DataFrame, userCol: String, tsCol: String,
                     idCol: String, typeCol: String,
                     conversionType: String, touchType: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touchId = when(col(typeCol) === touchType, col(idCol))
    events
      .withColumn("first_touch", first(touchId, ignoreNulls = true).over(w))
      .withColumn("last_touch", last(touchId, ignoreNulls = true).over(w))
      .filter(col(typeCol) === conversionType)
      .select(col(idCol), col(userCol), col(tsCol),
        col("first_touch"), col("last_touch"))
  }

  /** Last preceding touch within a lookback window of `lookbackSec`
    * seconds before the conversion (the industry-standard "30-day
    * window" form). RANGE frame over epoch seconds, so the window is
    * time-bounded regardless of event density; ids are not part of
    * the range ordering, so simultaneous events all qualify (the
    * inclusion test is purely temporal — document, don't hide).
    */
  def lastTouchWithin(events: DataFrame, userCol: String, tsCol: String,
                      idCol: String, typeCol: String,
                      conversionType: String, touchType: String,
                      lookbackSec: Long): DataFrame = {
    require(lookbackSec > 0, s"lookbackSec must be positive: $lookbackSec")
    val w = Window.partitionBy(col(userCol))
      .orderBy(unix_timestamp(col(tsCol)))
      .rangeBetween(-lookbackSec, -1)
    // max over (ts, id) structs: the LATEST touch in the window wins,
    // simultaneous touches deterministically by highest id — row
    // order inside a RANGE frame is undefined for equal timestamps,
    // so a positional last() here would be nondeterministic
    val best = max(when(col(typeCol) === touchType,
      struct(unix_timestamp(col(tsCol)).as("ts"), col(idCol).as("id")))).over(w)
    events
      .withColumn("last_touch", best.getField("id"))
      .filter(col(typeCol) === conversionType)
      .select(col(idCol), col(userCol), col(tsCol), col("last_touch"))
  }

  /** Attribution report: conversions per touch event (the "credit"
    * table a campaign dashboard reads), one aggregate over
    * [[firstLastTouch]].
    */
  def touchCredit(events: DataFrame, userCol: String, tsCol: String,
                  idCol: String, typeCol: String,
                  conversionType: String, touchType: String,
                  model: String = "last"): DataFrame = {
    val attributed = firstLastTouch(events, userCol, tsCol, idCol, typeCol,
      conversionType, touchType)
    val creditCol = model match {
      case "last"  => col("last_touch")
      case "first" => col("first_touch")
      case other => throw new IllegalArgumentException(
        s"attribution model must be 'first' or 'last': $other")
    }
    attributed.filter(creditCol.isNotNull)
      .groupBy(creditCol.as("touch_id"))
      .agg(count(lit(1)).as("conversions"))
  }
}
