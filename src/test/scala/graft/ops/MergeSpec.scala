package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("matched keys take the delta row, unmatched pass through, new keys append") {
    val corpus = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val delta = Seq((2L, "B2"), (9L, "new")).toDF("id", "v")
    val got = Merge.upsert(corpus, delta, "id")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "B2", 3L -> "c", 9L -> "new"))
  }

  test("empty delta is the identity; empty corpus returns the delta") {
    val corpus = Seq((1L, "a")).toDF("id", "v")
    val empty = corpus.limit(0)
    assert(Merge.upsert(corpus, empty, "id").count() == 1)
    assert(Merge.upsert(empty, corpus, "id").as[(Long, String)].collect()
      .toSeq == Seq((1L, "a")))
  }

  test("shuffle fallback path (delta above the broadcast gate) is identical") {
    val corpus = (1L to 200L).map(i => (i, s"c$i")).toDF("id", "v")
    val delta = (150L to 250L).map(i => (i, s"d$i")).toDF("id", "v")
    val viaBroadcast = Merge.upsert(corpus, delta, "id")
      .as[(Long, String)].collect().toMap
    val viaShuffle = Merge.upsert(corpus, delta, "id", maxBroadcastKeys = 1)
      .as[(Long, String)].collect().toMap
    assert(viaBroadcast == viaShuffle)
    assert(viaShuffle(1L) == "c1" && viaShuffle(150L) == "d150"
      && viaShuffle(250L) == "d250" && viaShuffle.size == 250)
  }

  test("corpus side of the merge plan has no shuffle when the delta broadcasts") {
    val corpus = (1L to 100L).map(i => (i, s"c$i")).toDF("id", "v")
    val delta = Seq((5L, "d5")).toDF("id", "v")
    val merged = Merge.upsert(corpus, delta, "id")
    // the anti-join must be a broadcast join: the ONLY exchanges in
    // the plan are broadcast exchanges (the union itself adds none)
    val plan = merged.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast anti-join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"corpus must not shuffle:\n$plan")
  }
}
