package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming ANN SERVING: micro-batches of queries answered against
  * the persisted IVF index inside foreachBatch — the online-serving
  * composition of the index (build once, probe per batch, zero
  * index-side exchanges). Every batch's answers must equal the batch
  * `ivfTopKAgainstIndex` call for the same queries.
  */
class StreamingAnnSpec extends SparkSpec {
  import spark.implicits._

  test("foreachBatch serving against the persisted IVF index equals batch answers") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    graft.ops.Similarity.buildIvfIndex(emb, "vec_id", "embedding",
      "graft_test_serve_ivf", nCells = 8, buckets = 4)
    val k = 5

    val input = MemoryStream[Long](spark)
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    val q = input.toDF().toDF("qid")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val queries = batch.join(emb, batch("qid") === emb("vec_id"))
          .select(col("qid"), col("embedding").as("qv"))
        val ans = graft.ops.Similarity.ivfTopKAgainstIndex(spark,
            "graft_test_serve_ivf", queries, "qid", "qv", k, nprobe = 8,
            overfetch = 64)
          .select("qid", "id", "rank").collect()
        results.synchronized {
          results ++= ans.map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        }
        ()
      }.start()
    try {
      input.addData(0L, 1L)
      q.processAllAvailable()
      input.addData(2L, 3L)
      q.processAllAvailable()
    } finally q.stop()

    val batchQueries = emb.filter($"vec_id" < 4)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val expected = graft.ops.Similarity.ivfTopKAgainstIndex(spark,
        "graft_test_serve_ivf", batchQueries, "qid", "qv", k, nprobe = 8,
        overfetch = 64)
      .select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(results.toSet == expected,
      s"missing=${(expected -- results.toSet).take(3)} extra=${(results.toSet -- expected).take(3)}")
    assert(results.size == 4 * k)
  }
}
