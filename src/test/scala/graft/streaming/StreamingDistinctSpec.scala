package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Maintained distinct counts: the replayed register fold must finish
  * to exactly the batch-computed estimate, and the register merge
  * must be an order-independent max-monoid.
  */
class StreamingDistinctSpec extends SparkSpec {
  import spark.implicits._

  private def rows = (1 to 400).map { i =>
    (s"g${i % 3}", s"k${i % (40 + i % 3 * 17)}")
  }.toDF("g", "k")

  test("4-batch replay finishes to exactly the batch estimate") {
    val streamed = StreamingDistinct.maintainedDistinct(
        rows, "g", "k", nChunks = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val batch = graft.ops.Profiling.hllDistinctByGroup(rows, "g", "k")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(streamed === batch)
  }

  test("maintainHllRegisters: fold == recompute, idempotent re-fold") {
    val base = rows.filter(col("k") =!= "k1")
    val delta = rows.filter(col("k") === "k1")
    def regs(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Profiling.hllRegisters(df, "g", "k")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    val folded = graft.ops.Profiling.maintainHllRegisters(
      regs(base), regs(delta))
    assert(key(folded) === key(regs(rows)))
    // max-monoid: folding the same delta again changes nothing
    val refolded = graft.ops.Profiling.maintainHllRegisters(
      folded, regs(delta))
    assert(key(refolded) === key(regs(rows)))
  }
}
