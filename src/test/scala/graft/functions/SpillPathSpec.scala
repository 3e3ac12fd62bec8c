package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sort-based-fallback (spill-path) parity for the four
  * TypedImperativeAggregates.
  *
  * ObjectHashAggregateExec keeps per-group buffers (priority queues,
  * hash maps, moment arrays) on the heap and FALLS BACK to sort-based
  * aggregation once the in-memory group count passes
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` — at
  * 100 TB group cardinalities that fallback IS the hot path, and it
  * exercises exactly what the in-memory path does not: every buffer
  * is serialized, sort-merged, and deserialized mid-aggregation.
  * Pinning the threshold to 1 forces the fallback for every group;
  * each aggregate's result must be BIT-identical to the in-memory
  * path's (same structs, same doubles, same orderings) — if a
  * serialize() drops a field or merge() depends on buffer identity,
  * this is the spec that catches it.
  */
class SpillPathSpec extends SparkSpec {
  import spark.implicits._

  private val FallbackConf =
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"

  /** Evaluate `df` normally and with the forced per-group fallback;
    * assert the collected outputs are value-identical (both ways
    * except-empty — Spark's except compares doubles bitwise through
    * their binary row form).
    */
  private def assertSpillParity(df: => DataFrame): Unit = {
    val normal = df
    assert(normal.queryExecution.executedPlan.toString
      .contains("ObjectHashAggregate"),
      "fixture must aggregate through ObjectHashAggregateExec")
    val inMem = normal.collect()
    val prior = spark.conf.getOption(FallbackConf)
    val spilled = try {
      spark.conf.set(FallbackConf, "1")
      df.collect()
    } finally {
      prior match {
        case Some(v) => spark.conf.set(FallbackConf, v)
        case None => spark.conf.unset(FallbackConf)
      }
    }
    assert(inMem.length == spilled.length,
      s"row counts differ: ${inMem.length} vs ${spilled.length}")
    val a = inMem.map(_.toString).sorted
    val b = spilled.map(_.toString).sorted
    assert(a.sameElements(b),
      "sort-based fallback diverged from the in-memory path:\n" +
        a.zip(b).filter(p => p._1 != p._2).take(3).mkString("\n"))
  }

  lazy val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
  lazy val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
  lazy val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("TopKPairs: forced sort-based fallback is bit-identical") {
    assertSpillParity(
      li.groupBy("l_orderkey")
        .agg(Native.topKPairs(col("l_extendedprice"),
          col("l_linenumber").cast("long"), 3).as("top")))
  }

  // Misra–Gries is ORDER-DEPENDENT by construction: the sort-based
  // fallback feeds each group's rows to update() in SORTED order
  // instead of arrival order, so eviction ties can land on different
  // (equally valid — the N/(k+1) bound holds either way) survivors.
  // Bitwise parity is therefore asserted where order cannot matter —
  // an eviction-free fixture, which still round-trips every buffer
  // through serialize/sort/deserialize — and the order-dependent case
  // is pinned at the CONSUMER contract: frequentTokens recounts the
  // candidates exactly, and every true-heavy token is guaranteed to
  // survive both paths, so the final exact answer must be identical.
  test("MisraGriesTokens: eviction-free fallback is bit-identical") {
    assertSpillParity(
      docs.select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("lang")
        // vocabulary per group is far below k: no decrements ever
        // fire, the buffer is the exact count map, and any
        // serialize/merge infidelity shows up bitwise
        .agg(Native.misraGries(col("tok"), 100000).as("heavy")))
  }

  test("MisraGriesTokens: frequentTokens' exact answer survives the fallback") {
    val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
    def answer(): Seq[(String, Long)] =
      graft.ops.HeavyHitters.frequentTokens(toks, "tok", support = 0.01)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val inMem = answer()
    assert(inMem.nonEmpty, "fixture must produce heavy hitters")
    val prior = spark.conf.getOption(FallbackConf)
    val spilled = try {
      spark.conf.set(FallbackConf, "1"); answer()
    } finally {
      prior match {
        case Some(v) => spark.conf.set(FallbackConf, v)
        case None => spark.conf.unset(FallbackConf)
      }
    }
    assert(inMem == spilled,
      s"exact recounted heavy hitters diverged:\n$inMem\nvs\n$spilled")
  }

  test("CountMinLongs: forced sort-based fallback is bit-identical") {
    assertSpillParity(
      docs.select(col("source"),
          explode(split(col("text"), " ")).as("tok"))
        .groupBy("source")
        .agg(Native.countMin(graft.ops.TextAnalysis.fingerprint(col("tok")),
          64, 4, graft.ops.HeavyHitters.CmsSeeds).as("cms")))
  }

  // Double addition is not associative: the fallback's sorted update
  // order re-brackets the Σx/Σxy accumulations, so real-valued inputs
  // drift at the last ulp — inherent to any streaming moments, not a
  // serialization defect. Bitwise parity is asserted on INTEGER-
  // valued vectors (integer double sums below 2^53 are exact in any
  // order, so only serialize/merge fidelity is on trial); the
  // real-embedding case pins n bitwise and the moments to 1e-12
  // relative.
  test("VectorMoments: integer-valued fallback is bit-identical") {
    assertSpillParity(
      li.select((col("l_orderkey") % 5).as("g"),
          array(col("l_quantity"), round(col("l_extendedprice"), 0),
            col("l_linenumber").cast("double")).as("v"))
        .groupBy("g")
        .agg(Native.vectorMoments(col("v")).as("m")))
  }

  test("VectorMoments: real-embedding fallback matches to 1e-12 relative") {
    def moments(): Map[Long, (Long, Seq[Double], Seq[Double])] = {
      emb.groupBy((col("vec_id") % 7).as("g"))
        .agg(Native.vectorMoments(col("embedding")).as("m"))
        .select(col("g"), col("m.n").as("n"), col("m.means").as("mean"),
          col("m.pairs.cov").as("cov"))
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getSeq[Double](2), r.getSeq[Double](3))))
        .toMap
    }
    val inMem = moments()
    val prior = spark.conf.getOption(FallbackConf)
    val spilled = try {
      spark.conf.set(FallbackConf, "1"); moments()
    } finally {
      prior match {
        case Some(v) => spark.conf.set(FallbackConf, v)
        case None => spark.conf.unset(FallbackConf)
      }
    }
    assert(inMem.keySet == spilled.keySet)
    def close(a: Double, b: Double): Boolean =
      a == b || math.abs(a - b) <= 1e-12 * math.max(math.abs(a), math.abs(b))
    inMem.foreach { case (g, (n, mean, cov)) =>
      val (n2, mean2, cov2) = spilled(g)
      assert(n == n2, s"group $g: n $n vs $n2")
      assert(mean.zip(mean2).forall((close _).tupled),
        s"group $g means diverged past 1e-12")
      assert(cov.zip(cov2).forall((close _).tupled),
        s"group $g covariances diverged past 1e-12")
    }
  }
}
