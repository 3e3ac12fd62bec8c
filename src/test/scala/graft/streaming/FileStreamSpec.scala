package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end Structured Streaming from a real file source: the
  * readStream → window agg → writeStream shape over parquet files,
  * checked against the identical batch computation.
  */
class FileStreamSpec extends SparkSpec {

  test("file-source stream matches batch windowed aggregation") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("ts", "event_type", "value").limit(2000)
    val dir = java.nio.file.Files.createTempDirectory("stream-src").toString
    events.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(events.schema).parquet(dir)
    val q = Sessionize.windowedCounts(stream, windowMinutes = 60, watermark = "0 minutes")
      .writeStream.format("memory").queryName("fs_wc").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT event_type, sum(n) AS n, round(sum(total_value), 4) AS tv FROM fs_wc GROUP BY 1")
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      val batch = spark.read.parquet(dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("tv"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(streamed == batch, s"stream=$streamed batch=$batch")
    } finally q.stop()
  }
}
