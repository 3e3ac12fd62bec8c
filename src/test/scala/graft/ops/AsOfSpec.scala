package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join picks latest right row at or before left ts") {
    val left = Seq((1L, 10L, "L1"), (1L, 5L, "L2"), (2L, 7L, "L3"))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 8L, "R1"), (1L, 3L, "R2"), (2L, 9L, "R3"))
      .toDF("k", "t", "rid")
    val out = AsOf.asofJoinLeft(left, right, "k", "t", "t", "rid")
      .select("lid", "right_rid").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out == Map("L1" -> Some("R1"), "L2" -> Some("R2"), "L3" -> None))
  }

  test("equal timestamps match (<= semantics) and all left rows survive") {
    val left = Seq((1L, 5L, "L1")).toDF("k", "t", "lid")
    val right = Seq((1L, 5L, "R1")).toDF("k", "t", "rid")
    val out = AsOf.asofJoinLeft(left, right, "k", "t", "t", "rid").collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("right_rid") == "R1")
  }

  test("purchases asof clicks on real events") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter($"event_type" === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter($"event_type" === "click")
      .select("event_id", "user_id", "ts")
    val out = AsOf.asofJoinLeft(purchases, clicks, "user_id", "ts", "ts", "event_id")
    assert(out.count() == purchases.count())
    // every matched click precedes (or equals) its purchase
    val bad = out.filter(col("right_ts").isNotNull && col("right_ts") > col("ts")).count()
    assert(bad == 0)
  }
}
