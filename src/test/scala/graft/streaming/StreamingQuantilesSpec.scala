package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Maintained quantiles: the replayed sketch fold must answer
  * bit-identically to the batch-built sketch.
  */
class StreamingQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def rows = (1 to 600).map { i =>
    (s"g${i % 2}", (i * 31L) % 3000)
  }.toDF("g", "v")

  test("4-batch replay answers exactly as the batch sketch") {
    val qs = Seq((1, 2), (3, 4), (19, 20))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2),
          r.getLong(3), r.getLong(4)))
        .sortBy(t => (t._1, t._2, t._3)).toSeq
    val streamed = StreamingQuantiles.maintainedQuantiles(
      rows, "g", "v", qs, nChunks = 4)
    val batch = graft.ops.QuantileSketch.quantiles(
      graft.ops.QuantileSketch.sketch(rows, "g", "v"), "g", qs)
    assert(key(streamed) === key(batch))
  }
}
