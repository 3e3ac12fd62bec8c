package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Stream-stream inner join with watermarks and an event-time range
  * condition — the streaming counterpart of the batch range join
  * (purchases enriched with clicks that preceded them within a
  * bounded window; the watermark + range bound let Spark expire
  * join state instead of buffering both streams forever).
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("watermarked stream-stream join matches within the time bound") {
    val clicks = MemoryStream[(Long, Long, Timestamp)](spark)
    val purchases = MemoryStream[(Long, Long, Timestamp)](spark)
    val c = clicks.toDF().toDF("click_id", "user_id", "click_ts")
      .withWatermark("click_ts", "1 hour")
    val p = purchases.toDF().toDF("purchase_id", "p_user_id", "purchase_ts")
      .withWatermark("purchase_ts", "1 hour")

    val joined = p.join(c,
      col("p_user_id") === col("user_id") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 10 MINUTES") &&
        col("click_ts") <= col("purchase_ts"))
      .select("purchase_id", "click_id")

    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      clicks.addData((100L, 7L, ts(0)), (101L, 7L, ts(8)), (102L, 8L, ts(5)))
      purchases.addData((200L, 7L, ts(9)), (201L, 9L, ts(9)))
      q.processAllAvailable()
      val got = spark.sql("SELECT purchase_id, click_id FROM ssj")
        .as[(Long, Long)].collect().toSet
      // purchase 200 (user 7, 10:09): clicks 100 (10:00, in window) and
      // 101 (10:08, in window); user 8's click and user 9's purchase
      // match nothing
      assert(got == Set((200L, 100L), (200L, 101L)))
    } finally q.stop()
  }

  test("late clicks beyond the range bound do not match") {
    val clicks = MemoryStream[(Long, Long, Timestamp)](spark)
    val purchases = MemoryStream[(Long, Long, Timestamp)](spark)
    val c = clicks.toDF().toDF("click_id", "user_id", "click_ts")
      .withWatermark("click_ts", "1 hour")
    val p = purchases.toDF().toDF("purchase_id", "p_user_id", "purchase_ts")
      .withWatermark("purchase_ts", "1 hour")
    val joined = p.join(c,
      col("p_user_id") === col("user_id") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 10 MINUTES") &&
        col("click_ts") <= col("purchase_ts"))
    val q = joined.writeStream.format("memory").queryName("ssj2")
      .outputMode("append").start()
    try {
      clicks.addData((100L, 7L, ts(0)))
      purchases.addData((200L, 7L, ts(30))) // click 30 min earlier: outside
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM ssj2").count() == 0)
    } finally q.stop()
  }
}
