package graft.ops

import graft.SparkSpec

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("weighted quantiles: hand-computed crossings, ties, boundaries") {
    // group A: values 1,2,3 with weights 1,1,2 (W=4):
    //   p=.25 -> target 1 -> first cumw>=1 is value 1
    //   p=.5  -> target 2 -> value 2 (cumw 2, prev 1)
    //   p=.75 -> target 3 -> value 3 (cumw 4, prev 2)
    // group B: one heavy value dominates every quantile
    val df = Seq(
      ("A", 1L, 1.0, 1L), ("A", 2L, 2.0, 1L), ("A", 3L, 3.0, 2L),
      ("B", 1L, 5.0, 1L), ("B", 2L, 7.0, 98L), ("B", 3L, 9.0, 1L))
      .toDF("g", "id", "v", "w")
    val got = Quantiles.weightedQuantiles(df, "g", "v", "w", "id",
        Seq(0.25, 0.5, 0.75))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq === Seq(("A", 1.0, 2.0, 3.0), ("B", 7.0, 7.0, 7.0)))
  }

  test("equal weights reduce to the type-1 unweighted quantile") {
    val vals = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("g", i.toLong, v, 1L) }
      .toDF("g", "id", "v", "w")
    val got = Quantiles.weightedQuantiles(df, "g", "v", "w", "id", Seq(0.5))
      .collect()(0).getDouble(1)
    // type-1 median of 8 values = 4th smallest (first cumw >= 4)
    assert(got === vals.sorted.apply(3))
  }

  test("weighted quantiles are partition-invariant") {
    val df = (1L to 500L).map(i => (i % 7, i, (i * 13 % 101).toDouble, 1L + i % 5))
      .toDF("g", "id", "v", "w")
    val a = Quantiles.weightedQuantiles(df, "g", "v", "w", "id",
      Seq(0.1, 0.5, 0.9)).orderBy("g").collect().toSeq
    val b = Quantiles.weightedQuantiles(df.repartition(17), "g", "v", "w", "id",
      Seq(0.1, 0.5, 0.9)).orderBy("g").collect().toSeq
    assert(a === b)
  }
}
