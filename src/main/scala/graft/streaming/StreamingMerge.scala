package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuously-maintained keyed corpus — the streaming form of
  * [[graft.ops.Merge.upsertDelete]]: each micro-batch carries upsert
  * rows and tombstone keys (the CDC shape: an `is_delete` flag), and
  * `foreachBatch` folds them into the maintained corpus with the
  * same single-anti-join merge the batch path uses. The production
  * body at 100 TB writes the merged result back to the bucketed
  * corpus table per batch (write-then-swap, as the index families
  * do); the replay harness carries it as a checkpointed frame.
  *
  * Unlike the additive folds ([[StreamingStats]] et al.), MERGE is
  * order-dependent in general — a later upsert of a key overwrites
  * an earlier one. The replay is deterministic (and equal to the
  * ONE-SHOT `upsertDelete` of all deltas, which is what the oracle
  * checks) when each key appears in at most one delta row — the
  * normal CDC-compacted contract, asserted per batch by
  * `upsertDelete`'s own delta∩delete fail-fast.
  */
object StreamingMerge {

  /** Replay `deltas` (upsert rows with `opCol` = false, tombstone
    * rows with `opCol` = true, payload columns ignored for
    * tombstones) as an ordered chunked file stream, folding each
    * micro-batch into `corpus`; returns the final merged corpus.
    * Harness entry — the foreachBatch body is the production path.
    */
  def maintainedCorpus(corpus: DataFrame, deltas: DataFrame,
                       keyCol: String, opCol: String,
                       nChunks: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    import org.apache.spark.sql.expressions.Window
    // The replay ≡ one-shot guarantee rests on one-delta-row-per-key;
    // upsertDelete fail-fasts only the PER-BATCH delta∩delete overlap,
    // so a duplicate upsert of a key split ACROSS micro-batches would
    // silently become last-write-wins while the one-shot merge keeps
    // both rows. Assert the whole-frame contract once, loudly, before
    // chunking — same failure discipline as the delete overlap.
    // count(keyCol) and count_distinct both SKIP NULLs, so the
    // duplicate gate alone would let multiple NULL-key rows through
    // undetected (r11 advice) — also require zero null keys.
    val uniq = deltas.agg(count(col(keyCol)).as("n"),
      count_distinct(col(keyCol)).as("d"),
      count(lit(1)).as("rows")).collect()(0)
    require(uniq.getLong(2) == uniq.getLong(0),
      s"maintainedCorpus: ${uniq.getLong(2) - uniq.getLong(0)} NULL " +
        s"'$keyCol' rows in deltas — the CDC contract requires a " +
        "non-null key on every delta row")
    require(uniq.getLong(0) == uniq.getLong(1),
      s"maintainedCorpus: ${uniq.getLong(0) - uniq.getLong(1)} duplicate " +
        s"'$keyCol' rows in deltas — the CDC contract is one delta row " +
        "per key; compact upstream (replay order would otherwise pick a " +
        "winner the one-shot merge does not)")
    val srcPath = Sessionize.preparedSource("graft-stream-merge-src",
      deltas.queryExecution.logical.semanticHash().toLong * 31L + nChunks) { p =>
      val n = deltas.count()
      val per = math.max(1L, (n + nChunks - 1) / nChunks)
      // chunk by key order: any split works — one-delta-row-per-key
      // makes the fold order irrelevant — but a DETERMINISTIC split
      // keeps the replay reproducible run to run
      val chunked = deltas
        .withColumn("_rn", row_number().over(Window.orderBy(keyCol)))
        .withColumn("_c", ((col("_rn") - 1) / per).cast("int"))
        .drop("_rn")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val seen = scala.collection.mutable.Set.empty[java.nio.file.Path]
      val stampBase = System.currentTimeMillis() - (nChunks + 2) * 60000L
      try {
        for (c <- 0 until nChunks) {
          chunked.filter(col("_c") === c).drop("_c").coalesce(1)
            .write.mode("append").parquet(p.toString)
          Sessionize.stampNewFiles(p, seen, stampBase + c * 60000L)
        }
      } finally { chunked.unpersist(); () }
    }
    val schema = spark.read.parquet(srcPath.toString).schema
    val ss = Sessionize.streamSession(spark)
    val stream = ss.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcPath.toString)
    // batchId-guarded body (r12): an at-least-once retry of an
    // already-applied batch is a no-op instead of a double fold
    val proc = new MergeBatchProcessor(corpus, keyCol, opCol)
    val q = stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) => proc.process(batch, batchId)
    }.start()
    try q.processAllAvailable() finally q.stop()
    proc.state
  }
}
