package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming exact dedup: dropDuplicates on the content key carries
  * state across micro-batches, so re-sent content is emitted once.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("streaming dedup emits each content exactly once across batches") {
    val input = MemoryStream[(Long, String)](spark)
    val deduped = input.toDF().toDF("doc_id", "text")
      .withColumn("ck", graft.ops.Dedup.contentKey(col("text")))
      .dropDuplicates("ck")
    val q = deduped.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      input.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
      q.processAllAvailable()
      input.addData((4L, "alpha"), (5L, "gamma"))
      q.processAllAvailable()
      val texts = spark.sql("SELECT text FROM sdedup").collect().map(_.getString(0)).sorted
      assert(texts.toSeq == Seq("alpha", "beta", "gamma"))
    } finally q.stop()
  }
}
