package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The r12 idempotence contract for the production foreachBatch
  * bodies: Spark's foreachBatch is at-least-once, so each body run
  * TWICE with the same batchId must leave the sink and the driver
  * state exactly as one run does — the retry scenario the replay
  * harness (which never fails a batch) cannot exercise.
  */
class IdempotentBatchSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  test("merge body: retry of an applied batch is a no-op; distinct ids fold") {
    val corpus = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val proc = new MergeBatchProcessor(corpus, "k", "op")
    val b0 = Seq((2L, "b2", false), (3L, "c", false), (1L, "", true))
      .toDF("k", "v", "op")
    proc.process(b0, 0L)
    val once = proc.state.orderBy("k").collect().toSeq
    proc.process(b0, 0L) // at-least-once retry
    assert(proc.state.orderBy("k").collect().toSeq == once)
    assert(once.map(r => (r.getLong(0), r.getString(1))) ==
      Seq((2L, "b2"), (3L, "c")))
    // a NEW batchId still folds
    proc.process(Seq((4L, "d", false)).toDF("k", "v", "op"), 1L)
    assert(proc.state.count() == 3)
  }

  test("dedup body: retry rewrites its own batch dir — sink unchanged") {
    val existing = docs(100L -> "corpus only text here")
    val idx = "graft_idem_idx_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(10)
    graft.ops.Dedup.buildBandIndex(existing, "doc_id", "text", idx,
      3, 32, 16, buckets = 16, membersTable = false)
    val out = java.nio.file.Files.createTempDirectory("graft-idem-out")
    try {
      val init = docs().limit(0)
      init.write.mode("overwrite")
        .parquet(BatchProcessors.batchDir(out, -1L))
      val proc = new DedupBatchProcessor(idx, 1.0, out, init)
      val b0 = docs(1L -> "first unique document text",
        2L -> "first unique document text", // in-batch dup of 1
        3L -> "corpus only text here")      // near-dup of the corpus
      proc.process(b0, 0L)
      def sink() = spark.read.parquet(out.toString)
        .select("doc_id").orderBy("doc_id")
        .collect().map(_.getLong(0)).toSeq
      val once = sink()
      assert(once == Seq(1L), s"survivors: $once")
      proc.process(b0, 0L) // retry: same batchId
      assert(sink() == once, "retry must not double-write")
      assert(proc.accepted.count() == 1)
      // next batch: exact dup of accepted history drops, novel lands
      proc.process(docs(4L -> "first unique document text",
        5L -> "second unique document text"), 1L)
      assert(sink() == Seq(1L, 5L))
    } finally {
      for (t <- Seq("meta", "bands", "sigs", "members"))
        spark.sql(s"DROP TABLE IF EXISTS `${idx}_$t`")
      StreamingDedup.deleteRecursively(out)
    }
  }

  test("ingest body: retry leaves the ledger unchanged, statuses intact") {
    val existing = docs(100L -> ("corpus resident document with plenty of " +
      "perfectly ordinary running prose words " + ("filler words " * 30)))
    val idx = "graft_idem_ing_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(10)
    graft.ops.Dedup.buildBandIndex(existing, "doc_id", "text", idx,
      3, 32, 16, buckets = 16, membersTable = false)
    val ledger = java.nio.file.Files.createTempDirectory("graft-idem-led")
    try {
      val init = docs().limit(0)
      init.select(col("doc_id"), lit("init").as("status"))
        .write.mode("overwrite")
        .parquet(BatchProcessors.batchDir(ledger, -1L))
      val proc = new IngestBatchProcessor(idx, 1.0, 50, ledger,
        init.select("doc_id", "text"))
      // varied ≥50-token prose: passes token count, mean word length,
      // alpha fraction, stopword and top-bigram repetition rules
      val good = "the quick brown fox jumps over a lazy dog and then " +
        "wanders across wide open fields to find some water while " +
        "birds sing in tall green trees near an old stone bridge " +
        "where children often play during warm summer afternoons " +
        "with their friends from school because life in this small " +
        "village moves at a gentle pace that visitors find quite " +
        "charming indeed every single year"
      val b0 = docs(1L -> good, 2L -> "too short")
      proc.process(b0, 0L)
      def sink() = spark.read.parquet(ledger.toString)
        .select("doc_id", "status").filter(col("status") =!= "init")
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      val once = sink()
      assert(once == Seq((1L, "accepted"), (2L, "dropped_quality")), once)
      proc.process(b0, 0L) // retry
      assert(sink() == once, "retry must not double-write the ledger")
      // a later batch duplicating accepted content is a duplicate
      proc.process(docs(3L -> good), 1L)
      assert(sink() == once :+ ((3L, "dropped_duplicate")))
    } finally {
      for (t <- Seq("meta", "bands", "sigs", "members"))
        spark.sql(s"DROP TABLE IF EXISTS `${idx}_$t`")
      StreamingDedup.deleteRecursively(ledger)
    }
  }
}
