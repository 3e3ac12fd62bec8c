package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** foreachBatch sink: the escape hatch that lets a stream reuse any
  * BATCH writer (upserts, multi-table writes, JDBC...) per
  * micro-batch. Here each micro-batch appends to a parquet dir and
  * the final table must equal the batch-computed result.
  */
class ForeachBatchSinkSpec extends SparkSpec {
  import spark.implicits._

  test("streaming foreachBatch parquet append equals batch result") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fbsink").toString
    val input = MemoryStream[(Long, String)](spark)
    val df = input.toDF().toDF("id", "kind")
    val q = df.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.withColumn("tagged", upper(col("kind")))
          .write.mode("append").parquet(dir)
      }
      .start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      input.addData((3L, "c"))
      q.processAllAvailable()
      val got = spark.read.parquet(dir)
        .orderBy("id").as[(Long, String, String)].collect().toSeq
      assert(got == Seq((1L, "a", "A"), (2L, "b", "B"), (3L, "c", "C")))
    } finally q.stop()
  }
}
