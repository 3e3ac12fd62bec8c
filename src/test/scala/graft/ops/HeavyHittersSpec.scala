package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Misra–Gries sketch + exact recount: exactness against a local
  * ground truth, the no-false-negative guarantee under adversarial
  * small sketches, partition-invariance (partial aggregation and the
  * mergeable-summaries merge rule), and the bounded-shuffle plan.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def groundTruth(tokens: Seq[String], support: Double) = {
    val n = tokens.size
    tokens.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= math.ceil(support * n).toLong)
      .toMap
  }

  test("exact counts and threshold on a skewed stream") {
    // 600×a, 300×b, 60×c, singletons tail
    val tokens = Seq.fill(600)("a") ++ Seq.fill(300)("b") ++
      Seq.fill(60)("c") ++ (0 until 40).map(i => s"t$i")
    val df = tokens.toDF("token").repartition(7)
    val got = HeavyHitters.frequentTokens(df, "token", support = 0.05)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == groundTruth(tokens, 0.05))
  }

  test("guarantee holds at the minimum legal sketch size") {
    // k+1 > 1/s with s=0.25 → k=4 minimum; adversarial tail of
    // distinct tokens forces constant decrements.
    val tokens = Seq.fill(30)("hot") ++ (0 until 70).map(i => s"u$i")
    val df = tokens.toDF("token").repartition(5)
    val got = HeavyHitters.frequentTokens(df, "token", support = 0.25,
      kOverride = Some(4))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("hot" -> 30L)) // 30 ≥ ceil(0.25·100)
    intercept[IllegalArgumentException] {
      HeavyHitters.frequentTokens(df, "token", support = 0.25,
        kOverride = Some(3))
    }
  }

  test("result is partition-invariant") {
    val tokens = (0 until 2000).map(i => s"w${i % 37}") ++
      Seq.fill(500)("dominant")
    val byPart = (1 to 16 by 5).map { p =>
      HeavyHitters.frequentTokens(tokens.toDF("token").repartition(p),
          "token", support = 0.03)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    assert(byPart.distinct.size == 1, "answer varied with partitioning")
    assert(byPart.head.toMap == groundTruth(tokens, 0.03))
  }

  test("nulls and empty input") {
    val df = Seq(Some("x"), None, Some("x"), None, Some("y"))
      .toDF("token")
    // N counts non-null tokens only (3): x=2 ≥ ceil(0.5·3)=2
    val got = HeavyHitters.frequentTokens(df, "token", support = 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("x" -> 2L))
    assert(HeavyHitters.frequentTokens(
      Seq.empty[String].toDF("token"), "token", support = 0.1).isEmpty)
  }

  test("sketch pass partially aggregates: no row-level shuffle") {
    val df = (0 until 5000).map(i => s"w${i % 11}").toDF("token")
      .repartition(8)
    val agg = df.agg(
      graft.functions.Native.misraGries(col("token"), 16).as("cand"))
    agg.collect()
    // partial_misragriestokens below the exchange = map-side sketch;
    // the shuffle carries k-bounded buffers, not token rows
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("partial_misragriestokens"),
      s"no partial aggregation in:\n$plan")
  }

  test("countMin never undercounts, is exact without collisions, and is partition-invariant") {
    import graft.ops.HeavyHitters._
    // Zipf-ish stream over 12 distinct keys, hashed like production.
    val toks = (0 until 3000).map(i => s"tok${i % (1 + i % 12)}").toDF("token")
      .withColumn("h", TextAnalysis.fingerprint(col("token")))
    val sketch = cmsSketch(toks, "h")
    val exact = toks.groupBy("token", "h").agg(count(lit(1)).as("n"))
    val got = exact.crossJoin(sketch)
      .select(col("token"), col("n"),
        cmsEstimate(col("sketch"), col("h")).as("est"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (t, n, est) =>
      assert(est >= n, s"$t undercounted: est $est < exact $n") }
    // 12 keys in 4x1024 buckets: no collisions, so estimates are exact
    assert(got.forall { case (_, n, est) => est == n })

    // bit-identical sketch under a different partitioning
    val a = sketch.collect()(0).getSeq[Long](0)
    val b = cmsSketch(toks.repartition(13), "h").collect()(0).getSeq[Long](0)
    assert(a == b)

    // sketch(A ++ B) = sketch(A) + sketch(B) elementwise
    val half1 = toks.limit(1000)
    val s1 = cmsSketch(half1, "h").collect()(0).getSeq[Long](0)
    val sAll = cmsSketch(half1.unionAll(half1), "h").collect()(0).getSeq[Long](0)
    assert(sAll == s1.map(_ * 2))
  }
}
