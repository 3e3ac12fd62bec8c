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
}
