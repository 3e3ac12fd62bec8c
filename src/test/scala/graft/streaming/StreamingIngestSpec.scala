package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  // corpus + incoming crafted so every ledger disposition occurs:
  // good quality = passes gopherRules at minTokens = 10
  private val good =
    "the cat and the dog have been to the park of wonders today"
  private def goodN(i: Int) =
    s"the cat and the dog have been to the park of wonders today number$i"

  test("ingestGate ledger: quality rejects, index dups, history dups, accepted") {
    val existing = Seq(
      (1L, goodN(1)), (2L, goodN(2)), (3L, goodN(3))).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, goodN(10)),          // novel, good -> accepted
      (11L, goodN(2)),           // exact copy of corpus doc -> dup (index hit)
      (12L, "### $$$ %%% ^^^"),  // low quality -> dropped_quality
      (13L, goodN(13)),          // novel -> accepted
      (14L, goodN(13)),          // in-batch/history copy of 13 -> dup
      (15L, good),               // novel distinct content -> accepted
      (26L, goodN(10))           // later chunk, copy of accepted 10 -> dup
    ).toDF("doc_id", "text")
    val ledger = StreamingIngest.ingestGate(existing, incoming,
        "doc_id", "text", minTokens = 10, nChunks = 3)
      .as[(Long, String)].collect().toMap
    assert(ledger === Map(
      10L -> "accepted", 11L -> "dropped_duplicate",
      12L -> "dropped_quality", 13L -> "accepted",
      14L -> "dropped_duplicate", 15L -> "accepted",
      26L -> "dropped_duplicate"))
    // the ledger covers every incoming id exactly once
    assert(ledger.keySet === Set(10L, 11L, 12L, 13L, 14L, 15L, 26L))
  }

  test("ingestGate accepted set equals the batch reference pipeline") {
    val existing = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).filter(col("doc_id") % 2 === 0)
    // incoming: odd docs (novel), plus re-ingested copies of corpus
    // content under fresh ids, plus a planted junk doc
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val incoming = docs.filter(col("doc_id") % 2 === 1)
      .unionAll(docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      .unionAll(Seq((2000000L, "@@@ ###")).toDF("doc_id", "text"))
    val ledger = StreamingIngest.ingestGate(existing, incoming,
      "doc_id", "text", minTokens = 10, nChunks = 3)
    val accepted = ledger.filter(col("status") === "accepted")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // batch reference: gopher-gate, drop content present in existing,
    // then min-id per surviving content
    val gatePass = graft.ops.TextAnalysis.gopherFilter(
        incoming, "doc_id", "text", minTokens = 10)
      .filter(col("keep")).select("doc_id")
    val expected = incoming.join(gatePass, Seq("doc_id"))
      .join(existing.select(col("text")), Seq("text"), "left_anti")
      .groupBy("text").agg(min("doc_id").as("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(accepted === expected,
      s"missing=${(expected -- accepted).take(5)} extra=${(accepted -- expected).take(5)}")
    // junk doc was rejected for quality, not as a duplicate
    assert(ledger.filter(col("doc_id") === 2000000L)
      .head().getString(1) === "dropped_quality")
  }
}
