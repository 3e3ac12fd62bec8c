package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quality-gated streaming ingest — the COMPLETE production loop of a
  * training-data pipeline, composed from pieces this library proves
  * individually: each micro-batch is
  *
  *   1. gated by the published Gopher quality rules
  *      ([[graft.ops.TextAnalysis.gopherFilter]] — one codegen'd
  *      projection, rejects carry a reason),
  *   2. deduped NEAR-dup against the existing corpus's persisted
  *      MinHash band index (hits-only probe, zero index-side
  *      exchanges — the [[StreamingDedup]] shape), and
  *   3. deduped EXACT against the accepted-so-far stream history
  *      (first-accepted-wins, min-id within a batch),
  *
  * with survivors appended to the sink inside the ordered micro-batch
  * loop. The output is the per-document ingest LEDGER — (doc_id,
  * status ∈ {accepted, dropped_quality, dropped_duplicate}) — the
  * auditable disposition record a governed corpus keeps next to its
  * data card: every incoming id appears exactly once, and the ledger
  * explains the gap between crawl volume and release volume.
  *
  * Scale shape: identical to [[StreamingDedup.streamedDedupIncrement]]
  * (corpus index written once per version, each batch pays one banded
  * probe + one content anti-join; accepted state rides as an eagerly
  * checkpointed frame), plus one codegen'd projection per batch for
  * the quality gate — the gate adds no shuffle and runs BEFORE the
  * probe, so low-quality documents never cost signature work.
  */
object StreamingIngest {

  /** Replay `incoming` as an ordered chunked file stream through the
    * quality→near-dup→exact-dup gate against `existing`; returns the
    * ledger (doc_id, status). Harness entry — the foreachBatch body
    * is the production path. `prebuiltIndex` as in
    * [[StreamingDedup.streamedDedupIncrement]].
    */
  def ingestGate(
      existing: DataFrame,
      incoming: DataFrame,
      idCol: String,
      textCol: String,
      minTokens: Int = 50,
      shingleN: Int = 3,
      k: Int = 32,
      bands: Int = 16,
      threshold: Double = 1.0,
      nChunks: Int = 3,
      prebuiltIndex: Option[String] = None): DataFrame = {
    val spark = existing.sparkSession
    import org.apache.spark.sql.expressions.Window
    val indexName = prebuiltIndex.getOrElse {
      val n = "graft_ingest_idx_" +
        java.util.UUID.randomUUID().toString.replace("-", "").take(12)
      graft.ops.Dedup.buildBandIndex(existing, idCol, textCol, n,
        shingleN, k, bands, buckets = 16, membersTable = false)
      n
    }
    val srcPath = Sessionize.preparedSource("graft-stream-ingest-src",
      incoming.queryExecution.logical.semanticHash().toLong * 37L + nChunks) { p =>
      val base = incoming.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      val n = base.count()
      val per = math.max(1L, (n + nChunks - 1) / nChunks)
      val chunked = base
        .withColumn("_rn", row_number().over(Window.orderBy("doc_id")))
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
    val ledgerPath = java.nio.file.Files.createTempDirectory("graft-ingest-ledger")
    try {
      val base = incoming.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      base.limit(0).select(col("doc_id"), lit("init").as("status"))
        .write.mode("overwrite").parquet(ledgerPath.toString)
      val schema = spark.read.parquet(srcPath.toString).schema
      val ss = Sessionize.streamSession(spark)
      val stream = ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(srcPath.toString)
      var acceptedState = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .select("doc_id", "text")
      val q = stream.writeStream.foreachBatch {
        (batch: DataFrame, _: Long) =>
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
          ledger.write.mode("append").parquet(ledgerPath.toString)
          acceptedState = acceptedState.unionByName(novel)
          ()
      }.start()
      try q.processAllAvailable() finally q.stop()
      val out = spark.read.parquet(ledgerPath.toString)
        .filter(col("status") =!= "init")
        .orderBy("doc_id")
      val rows = out.collect().toSeq
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), out.schema)
    } finally {
      if (prebuiltIndex.isEmpty)
        for (t <- Seq("meta", "bands", "sigs", "members"))
          spark.sql(s"DROP TABLE IF EXISTS `${indexName}_$t`")
      StreamingDedup.deleteRecursively(ledgerPath)
    }
  }
}
