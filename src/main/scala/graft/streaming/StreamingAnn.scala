package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming ANN SERVING (r13, oracles the §2.7 spec-only row): query
  * vectors arrive in micro-batches and every batch is answered inside
  * `foreachBatch` against the PERSISTED int8 IVF index — the
  * online-serving composition of the index lifecycle: build once,
  * probe per batch with zero index-side exchanges, the probe cost per
  * batch O(batch × probed cells), never a corpus scan.
  *
  * Replay shape (the house streamed-replay pattern): the query set is
  * staged as a 4-file parquet source read 2 files per trigger → 2
  * real micro-batches on a cloned stream session; per batch the
  * answers collect into a driver buffer (each batch's answer set is
  * queries×k rows — serving output, not corpus data) and the replay
  * returns their union. At all-cells probe + corpus-covering
  * overfetch the index path is EXACT, so the whole replay is
  * oracle-checkable against brute-force cosine top-k — the
  * q_ann_filtered argument, streamed.
  */
object StreamingAnn {

  def streamedAnnServe(emb: DataFrame, indexName: String,
                       nQueries: Int, k: Int, nprobe: Int,
                       overfetch: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val srcPath = Sessionize.preparedSource("graft-stream-ann",
      queries.queryExecution.logical.semanticHash().toLong ^ nQueries.toLong) { p =>
      queries.repartition(4).write.mode("overwrite").parquet(p.toString)
    }
    val ss = Sessionize.streamSession(spark)
    val schema = ss.read.parquet(srcPath.toString).schema
    val stream = ss.readStream.schema(schema)
      .option("maxFilesPerTrigger", 2).parquet(srcPath.toString)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int, Double)]
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val bs = batch.sparkSession
        val ans = graft.ops.Similarity.ivfTopKAgainstIndex(bs, indexName,
            batch, "qid", "qv", k, nprobe = nprobe, overfetch = overfetch)
          .collect()
        buf.synchronized {
          buf ++= ans.map(r =>
            (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
        }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    buf.toSeq.toDF("qid", "id", "rank", "cos")
      .select(col("qid"), col("id"), col("rank"),
        round(col("cos"), 6).as("cos"))
      .orderBy("qid", "rank")
  }
}
