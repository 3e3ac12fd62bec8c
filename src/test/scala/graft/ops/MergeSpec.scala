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

  test("maintainGroupStats: folded delta equals the full recompute exactly") {
    val base = Seq(("a", 1L), ("a", 4L), ("b", 2L)).toDF("g", "v")
    val delta = Seq(("a", 10L), ("c", 7L), ("c", 1L)).toDF("g", "v")
    val maintained = Merge.maintainGroupStats(
        Merge.groupStats(base, "g", "v"), delta, "g", "v")
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val full = Merge.groupStats(base.unionAll(delta), "g", "v")
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(maintained.toSeq === full.toSeq)
    // untouched group passes through, brand-new group appears
    assert(maintained.toSeq === Seq(("a", 3L, 15L), ("b", 1L, 2L), ("c", 2L, 8L)))

    // folding an empty delta is the identity
    val noop = Merge.maintainGroupStats(
        Merge.groupStats(base, "g", "v"), delta.limit(0), "g", "v")
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(noop.toSeq === Seq(("a", 2L, 5L), ("b", 1L, 2L)))
  }

  test("upsertDelete: delete drops, update wins, insert appends, rest passes") {
    val corpus = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v")
    val delta = Seq((2L, "B"), (9L, "I")).toDF("k", "v")
    val dels = Seq(Tuple1(3L)).toDF("k")
    val got = Merge.upsertDelete(corpus, delta, dels, "k")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((1L, "a"), (2L, "B"), (4L, "d"), (9L, "I")))
    // deleting an absent key is a no-op, not an error (idempotent erasure)
    val gone = Merge.upsertDelete(corpus, delta.limit(0),
        Seq(Tuple1(99L)).toDF("k"), "k")
      .orderBy("k").collect().map(_.getLong(0))
    assert(gone.toSeq === Seq(1L, 2L, 3L, 4L))
  }

  test("upsertDelete fails fast when a key is in both delta and deleteKeys") {
    val corpus = Seq((1L, "a")).toDF("k", "v")
    val both = intercept[IllegalArgumentException] {
      Merge.upsertDelete(corpus, Seq((1L, "A")).toDF("k", "v"),
        Seq(Tuple1(1L)).toDF("k"), "k")
    }
    assert(both.getMessage.contains("BOTH"), both.getMessage)
  }

  test("upsertDelete: corpus side stays unshuffled (one broadcast anti-join)") {
    val corpus = spark.range(1000).select(col("id").as("k"),
      (col("id") * 2).as("v"))
    val delta = Seq((5L, 55L)).toDF("k", "v")
    val dels = Seq(Tuple1(7L)).toDF("k")
    val plan = Merge.upsertDelete(corpus, delta, dels, "k")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast anti-join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"corpus must not shuffle:\n$plan")
  }

  test("groupStats rejects fractional value columns instead of truncating") {
    // cast("long") would silently floor 2.7 to 2 and change a
    // double-valued caller's stats — the contract is exact longs
    val frac = Seq(("a", 2.7), ("a", 1.2)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      Merge.groupStats(frac, "g", "v")
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
    // int values still fold (widened, not truncated)
    val ints = Seq(("a", 3), ("a", 4)).toDF("g", "v")
    val r = Merge.groupStats(ints, "g", "v").collect()(0)
    assert(r.getLong(1) == 2L && r.getLong(2) == 7L)
  }

  test("upsertDelete resolves a multi-column deleteKeys frame by NAME") {
    // a GDPR-erasure frame often carries audit columns; the key must be
    // picked by name, never by position
    val corpus = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val dels = Seq(("req-9", 2L), ("req-7", 3L)).toDF("request_id", "k")
    val got = Merge.upsertDelete(corpus, corpus.limit(0), dels, "k")
      .orderBy("k").collect().map(_.getLong(0))
    assert(got.toSeq === Seq(1L)) // NOT deleted-by-request_id
  }

  test("upsertDelete rejects a multi-column deleteKeys frame without the key") {
    val corpus = Seq((1L, "a")).toDF("k", "v")
    val ambiguous = Seq(("x", 1L)).toDF("other", "another")
    val e = intercept[IllegalArgumentException] {
      Merge.upsertDelete(corpus, corpus.limit(0), ambiguous, "k")
    }
    assert(e.getMessage.contains("single-column"), e.getMessage)
    // the single-column positional fallback still works under any name
    val renamed = Seq(Tuple1(1L)).toDF("whatever")
    val left = Merge.upsertDelete(corpus, corpus.limit(0), renamed, "k")
    assert(left.count() == 0)
  }
}
