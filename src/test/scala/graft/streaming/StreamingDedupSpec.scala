package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming exact dedup: dropDuplicates on the content key carries
  * state across micro-batches, so re-sent content is emitted once.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("streamed incremental dedup equals the batch answer across micro-batches") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
      .filter(graft.ops.TextAnalysis.wsTokenCount(col("text")) >= 3)
    // recrawls of existing content (must be dropped by the index
    // probe), genuinely new case-flipped docs (must survive at their
    // min id), and duplicates of those new docs at HIGHER ids — the
    // id-chunked replay puts each dup in a LATER micro-batch than its
    // original, so the accepted-sink anti-join is what catches it
    val recrawl = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
    val fresh = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 3000000L).as("doc_id"), upper(col("text")).as("text"))
    val freshDup = fresh
      .select((col("doc_id") + 4000000L).as("doc_id"), col("text"))
    val incoming = recrawl.unionAll(fresh).unionAll(freshDup)
    val got = graft.streaming.StreamingDedup.streamedDedupIncrement(
        docs, incoming, "doc_id", "text", threshold = 1.0, nChunks = 4)
      .as[Long].collect().toSet
    // batch composition with the same semantics: drop est-1.0 matches
    // of the corpus, then min id per distinct surviving content
    val hits = graft.ops.Dedup.minhashPairsAgainst(docs, incoming,
        "doc_id", "text", shingleN = 3, k = 32, bands = 16, threshold = 1.0)
      .select(col("id_in").as("doc_id")).distinct()
    val expected = incoming.join(hits, Seq("doc_id"), "left_anti")
      .groupBy("text").agg(min("doc_id").as("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(got == expected,
      s"extra=${(got -- expected).take(5)} missing=${(expected -- got).take(5)}")
    assert(got.nonEmpty && (got & freshDup.select("doc_id").as[Long].collect().toSet).isEmpty,
      "cross-chunk duplicates must be caught by the accepted sink")
    spark.catalog.clearCache()
  }

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
