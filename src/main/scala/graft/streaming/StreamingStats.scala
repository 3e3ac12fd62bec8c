package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuously-maintained corpus statistics — the streaming form of
  * [[graft.ops.Merge.maintainGroupStats]]: each micro-batch's group
  * aggregates fold into the persisted (group, n, sum) stats table
  * with one groups-sized merge, so the dashboard number is always
  * current and the corpus is NEVER rescanned. Because counts and
  * sums are a commutative monoid, the maintained table after any
  * replay order is EXACTLY the batch recompute — which is what the
  * oracle checks.
  *
  * Scale shape: per batch, one map-side-combined aggregate over the
  * batch (O(batch)) plus a full-outer join against O(groups) state;
  * state rides as an eagerly checkpointed groups-sized frame (the
  * [[StreamingDedup]] accepted-state pattern). No windows, no
  * watermarks — additive state has no lateness semantics to manage.
  */
object StreamingStats {

  /** Replay `rows` as an ordered chunked file stream, folding each
    * micro-batch into the maintained stats; returns the final
    * (groupCol, n, s) table. Harness entry — the foreachBatch body
    * is the production path.
    */
  def maintainedStats(rows: DataFrame, groupCol: String, valueCol: String,
                      nChunks: Int = 3): DataFrame = {
    val spark = rows.sparkSession
    import org.apache.spark.sql.expressions.Window
    val srcPath = Sessionize.preparedSource("graft-stream-stats-src",
      rows.queryExecution.logical.semanticHash().toLong * 31L + nChunks) { p =>
      val base = rows.select(col(groupCol).as("g"),
        col(valueCol).cast("long").as("v"))
      val n = base.count()
      val per = math.max(1L, (n + nChunks - 1) / nChunks)
      // rows with identical (g, v) are interchangeable between
      // chunks — additive folding is order-independent, so the
      // replay's answer (unlike its chunking) is deterministic
      val chunked = base
        .withColumn("_rn", row_number().over(Window.orderBy("g", "v")))
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
    var stats = graft.ops.Merge.groupStats(
      spark.read.parquet(srcPath.toString).limit(0), "g", "v")
    val q = stream.writeStream.foreachBatch {
      (batch: DataFrame, _: Long) =>
        stats = graft.ops.Merge.maintainGroupStats(stats, batch, "g", "v")
          .localCheckpoint()
        ()
    }.start()
    try q.processAllAvailable() finally q.stop()
    stats.select(col("g").as(groupCol), col("n"), col("s"), col("s2"),
      col("mn"), col("mx"))
  }
}
