package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String, String)*) =
    rows.toSeq.toDF("event_id", "user_id", "ts_s", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s")))
      .drop("ts_s")

  test("first/last touch picks the right preceding clicks") {
    val events = ev(
      (1L, 7L, "2024-01-01 10:00:00", "click"),
      (2L, 7L, "2024-01-01 10:05:00", "view"),
      (3L, 7L, "2024-01-01 10:10:00", "click"),
      (4L, 7L, "2024-01-01 10:20:00", "purchase"),
      (5L, 7L, "2024-01-01 10:30:00", "purchase"), // same touches
      (6L, 8L, "2024-01-01 09:00:00", "purchase"), // no touch at all
      (7L, 9L, "2024-01-01 09:00:00", "click"),
      (8L, 9L, "2024-01-01 09:00:00", "purchase")) // same-ts click: id 7 < 8 counts
    val got = Attribution.firstLastTouch(events, "user_id", "ts",
        "event_id", "event_type", "purchase", "click")
      .orderBy("event_id")
      .select("event_id", "first_touch", "last_touch")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(got.toSeq === Seq(
      (4L, 1L, 3L), (5L, 1L, 3L), (6L, -1L, -1L), (8L, 7L, 7L)))
  }

  test("lookback window excludes touches older than the horizon") {
    val events = ev(
      (1L, 7L, "2024-01-01 10:00:00", "click"),
      (2L, 7L, "2024-01-01 10:59:00", "click"),
      (3L, 7L, "2024-01-01 11:30:00", "purchase")) // 1h lookback: only id 2
    val got = Attribution.lastTouchWithin(events, "user_id", "ts",
        "event_id", "event_type", "purchase", "click", lookbackSec = 3600L)
      .select("event_id", "last_touch").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(got.toSeq === Seq((3L, 2L)))
    // shrink the window below both gaps: no attribution
    val none = Attribution.lastTouchWithin(events, "user_id", "ts",
        "event_id", "event_type", "purchase", "click", lookbackSec = 60L)
      .select("last_touch").collect()
    assert(none.length === 1 && none(0).isNullAt(0))
  }

  test("touchCredit aggregates conversions per winning touch") {
    val events = ev(
      (1L, 7L, "2024-01-01 10:00:00", "click"),
      (2L, 7L, "2024-01-01 10:20:00", "purchase"),
      (3L, 7L, "2024-01-01 10:30:00", "purchase"),
      (4L, 8L, "2024-01-01 10:00:00", "click"),
      (5L, 8L, "2024-01-01 10:05:00", "purchase"))
    val got = Attribution.touchCredit(events, "user_id", "ts",
        "event_id", "event_type", "purchase", "click")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 4L -> 1L))
    intercept[IllegalArgumentException] {
      Attribution.touchCredit(events, "user_id", "ts",
        "event_id", "event_type", "purchase", "click", model = "linear")
    }
  }

  test("attribution is partitioning-invariant (one user-key shuffle)") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    def run(df: org.apache.spark.sql.DataFrame) =
      Attribution.firstLastTouch(df, "user_id", "ts",
          "event_id", "event_type", "purchase", "click")
        .select("event_id", "first_touch", "last_touch").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(run(events) === run(events.repartition(11)))
  }
}
