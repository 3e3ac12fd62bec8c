package graft.ops

import graft.SparkSpec

/** Corpus-audit statistics: duplication-factor histogram,
  * empirical-Bayes shrunk group means, chi-square independence.
  */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("clusterSizeProfile: histogram, shares, and excess docs") {
    val docs = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"),
      (4L, "b"), (5L, "b"),
      (6L, "c"))
      .toDF("doc_id", "text")
    val rows = Dedup.clusterSizeProfile(docs, "text", "doc_id")
      .orderBy("cluster_size")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(rows.toSeq === Seq(
      (1L, 1L, 1L, 0.166667, 0L),
      (2L, 1L, 2L, 0.333333, 1L),
      (3L, 1L, 3L, 0.5, 2L)))
    // shares sum to 1; excess = what a hard dedup removes
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-5)
    assert(rows.map(_._5).sum === 3L)
  }

  test("ebShrunkMeans: shrinkage sits between raw mean and global, weighted by n") {
    val df = Seq(
      ("A", 1.0), ("A", 1.0), ("A", 1.0), ("A", 1.0),
      ("B", 0.0))
      .toDF("g", "v")
    val rows = Profiling.ebShrunkMeans(df, "g", "v", tau = 1.0)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    // global = 4/5 = 0.8; A: (4*1 + 0.8)/5 = 0.96; B: (0 + 0.8)/2 = 0.4
    assert(rows.toSeq === Seq(("A", 4L, 1.0, 0.96, 0.8), ("B", 1L, 0.0, 0.4, 0.8)))
    // more prior mass pulls harder toward the global mean
    val heavy = Profiling.ebShrunkMeans(df, "g", "v", tau = 100.0)
      .orderBy("g").collect().map(_.getDouble(3))
    assert(math.abs(heavy(0) - 0.8) < math.abs(0.96 - 0.8))
    assert(math.abs(heavy(1) - 0.8) < math.abs(0.4 - 0.8))
  }

  test("chiSquareIndependence: textbook 2x2 value, dof, Cramer's V") {
    val df = (Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(5)(("b", "x")) ++ Seq.fill(15)(("b", "y")))
      .toDF("r", "c")
    val row = Profiling.chiSquareIndependence(df, "r", "c").collect()(0)
    // e = {7.5, 12.5, 7.5, 12.5}; chi2 = 2*(6.25/7.5 + 6.25/12.5) = 8/3
    assert(row.getDouble(0) === 2.666667)
    assert(row.getLong(1) === 1L)
    assert(row.getLong(2) === 40L)
    assert(row.getDouble(3) === 0.258199) // sqrt((8/3)/40)
  }

  test("chiSquareIndependence counts EMPTY cells toward the statistic") {
    // (a,y) never observed: its expected count 1.0 must still be added.
    val df = (Seq.fill(4)(("a", "x")) ++
      Seq.fill(2)(("b", "x")) ++ Seq.fill(2)(("b", "y")))
      .toDF("r", "c")
    val row = Profiling.chiSquareIndependence(df, "r", "c").collect()(0)
    // e: ax=3, ay=1, bx=3, by=1 -> chi2 = 1/3 + 1 + 1/3 + 1 = 8/3
    assert(row.getDouble(0) === 2.666667)
    assert(row.getLong(1) === 1L)
    assert(row.getLong(2) === 8L)
  }

  test("portable HLL: accurate at both correction ranges, multiplicity-blind, partition-invariant") {
    import org.apache.spark.sql.functions.col
    // raw-range group: 2000 distinct keys; small-range group: 5
    val df = ((0 until 2000).map(i => ("big", s"key$i")) ++
      (0 until 500).map(i => ("small", s"k${i % 5}")))
      .toDF("g", "k")
    val got = Profiling.hllDistinctByGroup(df, "g", "k")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // m=256 -> standard error ~1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert(math.abs(got("big") / 2000.0 - 1) < 0.20, s"big: ${got("big")}")
    // small-range correction: 256*ln(256/V) lands within a key of 5
    assert(math.abs(got("small") - 5.0) < 1.5, s"small: ${got("small")}")

    // duplicates cannot move a distinct sketch, nor can partitioning
    val doubled = Profiling.hllDistinctByGroup(df.unionAll(df).repartition(13),
      "g", "k").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(doubled === got)
  }

  test("HLL registers merge: sharded register tables estimate EXACTLY like one pass") {
    import org.apache.spark.sql.functions.{abs, col, concat_ws, hash, lit}
    val keys = (0 until 1500).map(i => ("all", s"k$i")).toDF("g", "k")
    val whole = Profiling.hllEstimateFromRegisters(
      Profiling.hllRegisters(keys, "g", "k"), 8)
      .collect()(0).getDouble(1)
    // shard by key hash, sketch each shard separately, merge registers
    val sharded = keys.withColumn("g",
      concat_ws("-", lit("shard"), (abs(hash(col("k"))) % 3).cast("string")))
    val merged = Profiling.hllEstimateFromRegisters(
      Profiling.hllRegisters(sharded, "g", "k")
        .select(lit("all").as("g"), col("bucket"), col("mr")), 8)
      .collect()(0).getDouble(1)
    assert(merged === whole) // bucketwise max is associative: EXACT equality
  }

  test("benfordAudit: integer-cents digit extraction, zero/negative handling") {
    import org.apache.spark.sql.functions.col
    val df = Seq(1.00, 23.45, 0.05, 999.99, -12.00, 0.0, 1500.0)
      .toDF("v")
    val rows = Profiling.benfordAudit(df, "v").orderBy("digit")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    // digits: 1.00->1, 23.45->2, 0.05->5, 999.99->9, -12.00->1 (abs),
    // 0.0 filtered, 1500.0->1
    assert(rows.toSeq === Seq((1, 3L), (2, 1L), (5, 1L), (9, 1L)))
    val d1 = Profiling.benfordAudit(df, "v")
      .filter(col("digit") === 1).collect()(0)
    assert(d1.getDouble(3) === 0.30103) // log10(2), the Benford p(1)
  }

  test("groupOls: exact lines recovered per group; constant x yields null slope") {
    val df = (
      (1 to 20).map(i => ("A", i.toDouble, 2.0 * i + 1)) ++     // y = 2x+1
      (1 to 20).map(i => ("B", i.toDouble, -0.5 * i + 3)) ++    // y = -x/2+3
      (1 to 5).map(_ => ("C", 7.0, 1.0)))                       // constant x
      .toDF("g", "x", "y")
    val rows = Profiling.groupOls(df, "g", "x", "y")
      .orderBy("g").collect()
    val a = rows(0); val b = rows(1); val c = rows(2)
    assert((a.getDouble(2), a.getDouble(3), a.getDouble(4)) === ((2.0, 1.0, 1.0)))
    assert((b.getDouble(2), b.getDouble(3)) === ((-0.5, 3.0)))
    assert(c.isNullAt(2)) // det = 0: no slope, not a garbage number
  }

  test("zipfFit recovers the exponent of a planted Zipf distribution") {
    // token i appears round(2000/i) times, i = 1..50 -> slope ~ -1
    val rows = (1 to 50).flatMap(i =>
      Seq.fill(math.round(2000.0 / i).toInt)(s"tok$i"))
    val df = rows.toDF("token")
    val r = TextAnalysis.zipfFit(df, "token", k = 50).collect()(0)
    assert(r.getLong(0) === 50L)
    val slope = r.getDouble(1)
    assert(slope > -1.05 && slope < -0.95, s"slope $slope")
    assert(r.getDouble(3) > 0.99, s"r2 ${r.getDouble(3)}") // near-perfect fit

    // near-uniform counts -> slope ~ 0 (the "not natural text" signal)
    val uni = (1 to 30).flatMap(i => Seq.fill(100)(s"u$i")).toDF("token")
    val u = TextAnalysis.zipfFit(uni, "token", k = 30).collect()(0)
    assert(math.abs(u.getDouble(1)) < 0.05, s"uniform slope ${u.getDouble(1)}")
  }

  test("chiSquareIndependence: an exactly independent table scores ~0") {
    val df = (for { r <- Seq("a", "b"); c <- Seq("x", "y", "z");
                    _ <- 1 to 4 } yield (r, c)).toDF("r", "c")
    val row = Profiling.chiSquareIndependence(df, "r", "c").collect()(0)
    assert(math.abs(row.getDouble(0)) < 1e-9)
    assert(row.getLong(1) === 2L)
  }
}
