package graft.streaming

import graft.SparkSpec
import graft.ops.Multimodal
import org.apache.spark.sql.functions._

class StreamingMediaSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: Seq[(Long, Array[Byte])]) =
    rows.toDF("doc_id", "payload")

  test("a brightness-shifted re-upload in a LATER batch is dropped") {
    // ids ascend across 3 chunks of 2; id 5 is a brightness-shifted
    // re-encode of id 0's clip (different bytes, same fingerprint)
    // landing two batches later
    val rows = Seq(
      0L -> Multimodal.syntheticY4m(melody = 1, brightness = 0),
      1L -> "text one".getBytes("UTF-8"),
      2L -> Multimodal.syntheticY4m(melody = 2),
      3L -> "text two".getBytes("UTF-8"),
      4L -> "text one".getBytes("UTF-8"), // exact text dup of 1
      5L -> Multimodal.syntheticY4m(melody = 1, brightness = 32))
    assert(!java.util.Arrays.equals(rows.head._2, rows.last._2))
    val accepted = StreamingMedia.streamedFingerprintDedup(
        corpus(rows), "doc_id", "payload", nChunks = 3)
      .as[Long].collect().toSeq
    assert(accepted == Seq(0L, 1L, 2L, 3L), s"got $accepted")
  }

  test("streamed replay ≡ batch min-id per fingerprint on the planted corpus") {
    val rows = (0L until 40L).map { id =>
      if (id % 10 == 0)
        id -> Multimodal.syntheticY4m((id / 10) % 2, (((id / 10) % 3) * 8).toInt)
      else id -> s"doc ${id % 13}".getBytes("UTF-8") // planted text dups
    }
    val streamed = StreamingMedia.streamedFingerprintDedup(
        corpus(rows), "doc_id", "payload", nChunks = 4)
      .as[Long].collect().toSeq
    val media = corpus(rows).select(col("doc_id").as("media_id"),
      lit("unknown").as("media_type"),
      octet_length(col("payload")).cast("long").as("byte_len"),
      col("payload"))
    val batch = Multimodal.videoFingerprint(
        media.as(org.apache.spark.sql.Encoders.product[Multimodal.MediaRow]))
      .toDF().groupBy("vhash").agg(min("media_id").as("doc_id"))
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(streamed == batch)
  }

  test("at-least-once retry of a batch is a no-op") {
    val out = java.nio.file.Files.createTempDirectory("graft-media-retry")
    try {
      val init = spark.range(0)
        .select(col("id").as("doc_id"), lit(0L).as("vhash")).limit(0)
      val proc = new MediaDedupBatchProcessor(out, init)
      val b = corpus(Seq(
        1L -> Multimodal.syntheticY4m(0),
        2L -> "txt".getBytes("UTF-8")))
      proc.process(b, 0L)
      val afterFirst = proc.accepted.count()
      proc.process(b, 0L) // retry: same batchId
      assert(proc.accepted.count() == afterFirst)
      // a LATER batch carrying an already-accepted fingerprint adds nothing
      proc.process(corpus(Seq(
        9L -> Multimodal.syntheticY4m(0, brightness = 16))), 1L)
      assert(proc.accepted.count() == afterFirst)
    } finally StreamingDedup.deleteRecursively(out)
  }
}
