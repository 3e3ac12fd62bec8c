package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuously-maintained per-group QUANTILES — the streaming form
  * of [[graft.ops.QuantileSketch]] maintenance and the percentile
  * member of the maintained-state family ([[StreamingStats]] =
  * counts/sums/spread, [[StreamingDistinct]] = cardinalities): each
  * micro-batch's log-histogram sketch folds into persisted state by
  * elementwise integer add, so "p95 document length right now" reads
  * from a groups·buckets-sized frame without ever rescanning the
  * corpus — the incremental-median story (n, s, s2) cannot give.
  *
  * The sketch merge is an exact commutative monoid (integer adds),
  * so the maintained state after any replay order is EXACTLY the
  * batch-built sketch and the quantile estimates are bit-identical
  * to the batch oracle.
  */
object StreamingQuantiles {

  /** Replay `rows` as an ordered chunked file stream, folding each
    * micro-batch's sketch into maintained state; returns the final
    * per-group estimates (groupCol, q_num, q_den, n, est). Harness
    * entry — the foreachBatch body is the production path.
    */
  def maintainedQuantiles(rows: DataFrame, groupCol: String,
                          valueCol: String, qs: Seq[(Int, Int)],
                          m: Int = graft.ops.QuantileSketch.MantissaBits,
                          nChunks: Int = 3): DataFrame = {
    val spark = rows.sparkSession
    import org.apache.spark.sql.expressions.Window
    val srcPath = Sessionize.preparedSource("graft-stream-quantiles-src",
      rows.queryExecution.logical.semanticHash().toLong * 31L
        + nChunks * 13L + m) { p =>
      val base = rows.select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("long").as("v"))
      val n = base.count()
      val per = math.max(1L, (n + nChunks - 1) / nChunks)
      // identical (g, v) rows are interchangeable between chunks —
      // sketch addition is order-independent, so the replay's ANSWER
      // (unlike its chunking) is deterministic
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
    var state = graft.ops.QuantileSketch.sketch(
      spark.read.parquet(srcPath.toString).limit(0), "g", "v", m)
    val q = stream.writeStream.foreachBatch {
      (batch: DataFrame, _: Long) =>
        state = graft.ops.QuantileSketch.mergeSketches(state,
          graft.ops.QuantileSketch.sketch(batch, "g", "v", m), "g")
          .localCheckpoint()
        ()
    }.start()
    try q.processAllAvailable() finally q.stop()
    graft.ops.QuantileSketch.quantiles(state, "g", qs, m)
      .withColumnRenamed("g", groupCol)
  }
}
