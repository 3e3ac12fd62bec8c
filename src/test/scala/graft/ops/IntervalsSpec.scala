package graft.ops

import graft.SparkSpec

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  test("overlapping and touching intervals merge; gaps split islands") {
    val iv = Seq(
      (1L, 0L, 10L), (1L, 5L, 12L),   // overlap -> one island [0,12]
      (1L, 12L, 20L),                 // touching -> still island 1
      (1L, 30L, 35L),                 // gap -> island 2
      (2L, 0L, 1L))                   // other group independent
      .toDF("g", "s", "e")
    val isl = Intervals.islands(iv, "g", "s", "e")
      .orderBy("g", "island")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(isl.toSeq === Seq(
      (1L, 1L, 0L, 20L), (1L, 2L, 30L, 35L), (2L, 1L, 0L, 1L)))

    val cov = Intervals.coverage(iv, "g", "s", "e")
      .orderBy("g")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(cov.toSeq === Seq((1L, 2L, 25L), (2L, 1L, 1L)))
  }

  test("contained intervals don't reopen an island") {
    // [0,100] swallows [10,20] and [30,40]; a later short interval
    // starting before 100 must not start a new island
    val iv = Seq((1L, 0L, 100L), (1L, 10L, 20L), (1L, 30L, 40L), (1L, 99L, 101L))
      .toDF("g", "s", "e")
    val cov = Intervals.coverage(iv, "g", "s", "e").collect()(0)
    assert((cov.getLong(1), cov.getLong(2)) === ((1L, 101L)))
  }

  test("coverage is partition-invariant") {
    val iv = (1L to 300L).map(i => (i % 5, i * 3 % 97, i * 3 % 97 + 1 + (i % 11)))
      .toDF("g", "s", "e")
    val a = Intervals.coverage(iv, "g", "s", "e").orderBy("g").collect().toSeq
    val b = Intervals.coverage(iv.repartition(13), "g", "s", "e")
      .orderBy("g").collect().toSeq
    assert(a === b)
  }
}
