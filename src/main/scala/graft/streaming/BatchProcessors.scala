package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Idempotent foreachBatch bodies (r12, closes the r11 verdict's
  * robustness finding: "foreachBatch bodies ignore batchId").
  *
  * Spark's foreachBatch contract is AT-LEAST-ONCE: a failed
  * micro-batch is retried with the SAME batchId, so a body that
  * blindly `append`s to its sink double-writes on retry and a body
  * that folds driver-side state double-applies. Every production body
  * here follows the standard transactional recipe:
  *
  *   - sink writes go to a batchId-KEYED partition directory
  *     (`.../batch_id=<id>/`) with mode OVERWRITE — a retry rewrites
  *     its own directory instead of appending a second copy, and the
  *     sink root reads back as an ordinary partitioned table;
  *   - driver-state folds are guarded by the last-applied batchId —
  *     a retry of an already-applied batch is a no-op. Bodies write
  *     the sink BEFORE folding state, so state-applied implies
  *     sink-committed: a retry skipped by the guard can never leave
  *     a hole, and a retry after a failed write recomputes from the
  *     same pre-fold state and overwrites the same directory.
  *
  * The bodies live in named classes (not inline lambdas) so the
  * idempotence spec can invoke `process` TWICE with one batchId and
  * prove the sink and state unchanged — the contract test the r11
  * harness replays never exercised.
  */
object BatchProcessors {
  /** The batch's sink directory: a Hive-style partition path, so the
    * sink root is a normal partitioned parquet table.
    */
  def batchDir(root: java.nio.file.Path, batchId: Long): String =
    s"$root/batch_id=$batchId"

  /** Periodic sink maintenance (r13): the batchId-keyed directories
    * above accumulate one per micro-batch forever — compact each to
    * one file, shuffle-free, replayed reads row-identical (see
    * [[graft.io.Sources.compactPartitionedDir]]). Run it between
    * stream restarts or from a maintenance job; a directory a
    * retried batch might still rewrite is simply re-compacted on the
    * next pass (overwrite semantics keep both orders correct).
    */
  def compactSink(spark: SparkSession, root: java.nio.file.Path): Int =
    graft.io.Sources.compactPartitionedDir(spark, root.toString)
}

/** [[StreamingMerge.maintainedCorpus]] body: fold CDC deltas into the
  * maintained corpus, once per batchId.
  */
final class MergeBatchProcessor(
    corpus: DataFrame, keyCol: String, opCol: String) {
  private val payloadCols = corpus.columns.toSeq
  private var stateV: DataFrame = corpus
  private var lastApplied: Long = -1L

  def state: DataFrame = stateV

  def process(batch: DataFrame, batchId: Long): Unit = {
    if (batchId <= lastApplied) return // at-least-once retry: no-op
    val ups = batch.filter(!col(opCol)).select(payloadCols.map(col): _*)
    val dels = batch.filter(col(opCol)).select(keyCol)
    stateV = graft.ops.Merge.upsertDelete(stateV, ups, dels, keyCol)
      .localCheckpoint()
    lastApplied = batchId
  }
}

/** [[StreamingDedup.streamedDedupIncrement]] body: near-dup probe
  * against the persisted band index, exact-dup against accepted
  * history, survivors to the batch's own sink directory.
  */
final class DedupBatchProcessor(
    indexName: String, threshold: Double,
    outPath: java.nio.file.Path, initialState: DataFrame) {
  private var acceptedState: DataFrame = initialState
  private var lastApplied: Long = -1L

  def accepted: DataFrame = acceptedState

  def process(batch: DataFrame, batchId: Long): Unit = {
    if (batchId <= lastApplied) return // at-least-once retry: no-op
    val bs = batch.sparkSession
    // hits-only probe: the drop decision never consumes the
    // existing-side ids, so the _members expansion (the biggest
    // index table) is skipped per micro-batch.
    // materialize = false: the hit set is consumed once per
    // micro-batch and the batch is small — recomputing the
    // signature pass is cheaper than persist+checkpoint jobs
    val hits = graft.ops.Dedup.minhashHitsAgainstIndex(
      bs, indexName, batch, "doc_id", "text", threshold,
      materialize = false)
    val noCross = batch.join(hits, Seq("doc_id"), "left_anti")
    val inBatch = noCross.groupBy("text").agg(min("doc_id").as("doc_id"))
    val novel = inBatch
      .join(acceptedState.select("text"), Seq("text"), "left_anti")
      .select("doc_id", "text")
      .localCheckpoint()
    novel.write.mode("overwrite")
      .parquet(BatchProcessors.batchDir(outPath, batchId))
    acceptedState = acceptedState.unionByName(novel)
    lastApplied = batchId
  }
}

/** [[StreamingIngest.ingestGate]] body: quality gate → near-dup probe
  * → exact-dup, ledger rows to the batch's own sink directory.
  */
final class IngestBatchProcessor(
    indexName: String, threshold: Double, minTokens: Int,
    ledgerPath: java.nio.file.Path, initialState: DataFrame) {
  private var acceptedState: DataFrame = initialState
  private var lastApplied: Long = -1L

  def accepted: DataFrame = acceptedState

  def process(batch: DataFrame, batchId: Long): Unit = {
    if (batchId <= lastApplied) return // at-least-once retry: no-op
    val bs = batch.sparkSession
    // gate FIRST: rejected docs never pay signature work
    val gated = graft.ops.TextAnalysis.gopherFilter(
        batch, "doc_id", "text", minTokens)
      .select("doc_id", "keep")
    val passed = batch.join(gated.filter(col("keep")), Seq("doc_id"))
      .select("doc_id", "text")
    val hits = graft.ops.Dedup.minhashHitsAgainstIndex(
      bs, indexName, passed, "doc_id", "text", threshold,
      materialize = false)
    val noCross = passed.join(hits, Seq("doc_id"), "left_anti")
    val inBatch = noCross.groupBy("text").agg(min("doc_id").as("doc_id"))
    val novel = inBatch
      .join(acceptedState.select("text"), Seq("text"), "left_anti")
      .select("doc_id", "text")
      .localCheckpoint()
    // the ledger partitions the batch: quality rejects, then
    // anything gate-passed but not accepted is a duplicate
    val ledger = gated.filter(!col("keep"))
      .select(col("doc_id"), lit("dropped_quality").as("status"))
      .unionByName(novel
        .select(col("doc_id"), lit("accepted").as("status")))
      .unionByName(passed.select("doc_id")
        .join(novel.select("doc_id"), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), lit("dropped_duplicate").as("status")))
    ledger.write.mode("overwrite")
      .parquet(BatchProcessors.batchDir(ledgerPath, batchId))
    acceptedState = acceptedState.unionByName(novel)
    lastApplied = batchId
  }
}
