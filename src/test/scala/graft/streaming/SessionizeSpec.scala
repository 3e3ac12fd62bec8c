package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("batch sessionize splits on gap") {
    val events = Seq(
      (1L, ts(0), 7L, "click", 1.0),
      (2L, ts(10), 7L, "click", 2.0),
      (3L, ts(55), 7L, "view", 3.0),   // gap 45min -> new session
      (4L, ts(5), 8L, "click", 4.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Sessionize.sessionize(events, gapMinutes = 30)
      .orderBy("user_id", "session_no").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n_events") == 2 && out(0).getAs[Double]("total_value") == 3.0)
    assert(out(1).getAs[Long]("n_events") == 1 && out(1).getAs[Double]("total_value") == 3.0)
    assert(out(2).getAs[Long]("user_id") == 8L)
    assert(out(0).getAs[String]("session_start") == "2024-01-01 10:00:00")
    assert(out(0).getAs[String]("session_end") == "2024-01-01 10:10:00")
  }

  test("batch sessionize on real events table") {
    val out = Sessionize.sessionize(graft.Tables.events(spark, "/root/testdata/sf0.001"))
    val n = out.count()
    assert(n > 0)
    // every event lands in exactly one session
    val total = out.agg(sum("n_events")).head().getLong(0)
    assert(total == graft.Tables.events(spark, "/root/testdata/sf0.001").count())
  }

  test("streaming windowed counts with watermark") {
    val input = MemoryStream[(Timestamp, String, Double)](spark)
    val df = input.toDF().toDF("ts", "event_type", "value")
    val q = Sessionize.windowedCounts(df, windowMinutes = 5)
      .writeStream.format("memory").queryName("wc").outputMode("update").start()
    try {
      input.addData((ts(0), "click", 1.0), (ts(1), "click", 2.0), (ts(7), "view", 3.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_type, n, total_value FROM wc").collect()
      val byType = rows.map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(byType("click") == ((2L, 3.0)))
      assert(byType("view") == ((1L, 3.0)))
    } finally q.stop()
  }

  test("streaming sessionize closes sessions on timeout") {
    import Sessionize._
    val input = MemoryStream[Event](spark)
    val q = streamingSessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      input.addData(
        Event(1L, ts(0), 7L, "click", 1.0),
        Event(2L, ts(10), 7L, "click", 2.0))
      q.processAllAvailable()
      // advance event time far beyond watermark so user 7's session times out
      input.addData(Event(5L, Timestamp.valueOf("2024-01-01 12:00:00"), 9L, "view", 9.0))
      q.processAllAvailable()
      input.addData(Event(6L, Timestamp.valueOf("2024-01-01 14:00:00"), 9L, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, n_events, total_value FROM sess").collect()
      val u7 = rows.find(_.getLong(0) == 7L)
      assert(u7.isDefined, s"user 7 session not closed: ${rows.mkString(",")}")
      assert(u7.get.getLong(1) == 2L)
      assert(u7.get.getDouble(2) == 3.0)
    } finally q.stop()
  }
}
