package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamingStatsSpec extends SparkSpec {
  import spark.implicits._

  test("maintained stats across micro-batches equal the batch recompute exactly") {
    val rows = Seq(
      ("a", 1L), ("a", 4L), ("a", 4L), ("b", 2L), ("b", 9L),
      ("c", 7L), ("c", 1L), ("c", 0L), ("d", 100L))
      .toDF("g", "v")
    // 4 chunks over 9 rows -> a genuinely multi-batch replay where
    // some groups span batches and some live in a single batch
    val maintained = StreamingStats.maintainedStats(rows, "g", "v", nChunks = 4)
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val full = graft.ops.Merge.groupStats(rows, "g", "v")
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(maintained.toSeq === full.toSeq)
    assert(maintained.toSeq === Seq(
      ("a", 3L, 9L), ("b", 2L, 11L), ("c", 3L, 8L), ("d", 1L, 100L)))
  }
}
