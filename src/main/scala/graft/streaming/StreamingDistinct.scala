package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuously-maintained per-group DISTINCT counts — the streaming
  * member of the maintained-state family
  * ([[StreamingStats]] = counts/sums/spread,
  * [[StreamingQuantiles]] = percentiles, this = cardinalities):
  * each micro-batch folds its portable-HLL register table
  * ([[graft.ops.Profiling.hllRegisters]]) into the persisted state by
  * bucketwise max. Registers are a max-monoid, so the maintained
  * table after ANY replay order is exactly the batch-computed
  * registers — the estimate finishes from state, the raw keys are
  * never revisited, and the corpus is never rescanned.
  *
  * Scale shape: per batch O(batch) register extraction + an
  * O(groups·2^b) merge; state is a groups·buckets-sized frame riding
  * as an eager checkpoint (the [[StreamingDedup]] accepted-state
  * pattern). The register internals are integer-exact (Σ2^(zr−M)),
  * so the final estimate is bit-identical to the batch oracle.
  */
object StreamingDistinct {

  /** Replay `rows` as an ordered chunked file stream, folding each
    * micro-batch's HLL registers into maintained state; returns the
    * final per-group estimates (groupCol, hll_est). Harness entry —
    * the foreachBatch body is the production path.
    */
  def maintainedDistinct(rows: DataFrame, groupCol: String, keyCol: String,
                         b: Int = 8, nChunks: Int = 3): DataFrame = {
    val spark = rows.sparkSession
    import org.apache.spark.sql.expressions.Window
    val srcPath = Sessionize.preparedSource("graft-stream-distinct-src",
      rows.queryExecution.logical.semanticHash().toLong * 31L
        + nChunks * 17L + b) { p =>
      val base = rows.select(col(groupCol).cast("string").as("g"),
        col(keyCol).cast("string").as("k"))
      val n = base.count()
      val per = math.max(1L, (n + nChunks - 1) / nChunks)
      // identical (g, k) rows are interchangeable between chunks —
      // register max-folding is order-independent, so the replay's
      // ANSWER (unlike its chunking) is deterministic
      val chunked = base
        .withColumn("_rn", row_number().over(Window.orderBy("g", "k")))
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
    var regs = graft.ops.Profiling.hllRegisters(
      spark.read.parquet(srcPath.toString).limit(0), "g", "k", b)
    val q = stream.writeStream.foreachBatch {
      (batch: DataFrame, _: Long) =>
        regs = graft.ops.Profiling.maintainHllRegisters(regs,
          graft.ops.Profiling.hllRegisters(batch, "g", "k", b))
          .localCheckpoint()
        ()
    }.start()
    try q.processAllAvailable() finally q.stop()
    graft.ops.Profiling.hllEstimateFromRegisters(regs, b)
      .withColumnRenamed("g", groupCol)
  }
}
