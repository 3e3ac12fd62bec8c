package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("driftReport: identical corpora score 0, disjoint score ln 2, churn counted") {
    val a = Seq((1L, "alpha beta gamma"), (2L, "beta beta delta")).toDF("doc_id", "text")
    val same = Snapshot.driftReport(a, a, "text").collect()(0)
    assert(same.getDouble(6) == 0.0)
    assert(same.getLong(4) == 0L && same.getLong(5) == 0L) // no vocab churn

    val b = Seq((1L, "zeta eta theta"), (2L, "iota kappa")).toDF("doc_id", "text")
    val disj = Snapshot.driftReport(a, b, "text").collect()(0)
    assert(math.abs(disj.getDouble(6) - math.log(2.0)) < 1e-6)
    assert(disj.getLong(2) == 4L && disj.getLong(3) == 5L) // vocab sizes
    assert(disj.getLong(4) == 5L && disj.getLong(5) == 4L) // added/removed

    val half = Snapshot.driftReport(a,
      Seq((1L, "alpha beta gamma"), (2L, "nu xi omicron")).toDF("doc_id", "text"),
      "text").collect()(0)
    assert(half.getDouble(6) > 0.0 && half.getDouble(6) < math.log(2.0))
  }

  test("diff classifies added/removed/changed/unchanged") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val cur = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "v")
    val got = Snapshot.diff(old, cur, "k", Seq("v"))
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got === Seq(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("NULL content: null vs value is changed, null vs null unchanged") {
    val old = Seq((1L, Option("x")), (2L, Option.empty[String])).toDF("k", "v")
    val cur = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("k", "v")
    val got = Snapshot.diff(old, cur, "k", Seq("v"))
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got === Seq(1L -> "changed", 2L -> "unchanged"))
    // a control character as a VALUE must be a change from NULL —
    // a sentinel-based encoding collides here (this spec caught
    // exactly that in the original separator+sentinel contentHash)
    val lit2 = Seq((1L, Option("\u0002"))).toDF("k", "v")
    val nul = Seq((1L, Option.empty[String])).toDF("k", "v")
    assert(Snapshot.diff(nul, lit2, "k", Seq("v"))
      .head().getString(1) === "changed")
  }

  test("multi-column compare is order-sensitive and separator-safe") {
    // ("ab","c") vs ("a","bc") must differ: the length prefix
    // prevents concatenation collisions
    val old = Seq((1L, "ab", "c")).toDF("k", "x", "y")
    val cur = Seq((1L, "a", "bc")).toDF("k", "x", "y")
    assert(Snapshot.diff(old, cur, "k", Seq("x", "y"))
      .head().getString(1) === "changed")
    // adversarial values carrying a would-be separator can't forge a
    // column boundary either
    val old2 = Seq((1L, "a\u0001", "b")).toDF("k", "x", "y")
    val cur2 = Seq((1L, "a", "\u0001b")).toDF("k", "x", "y")
    assert(Snapshot.diff(old2, cur2, "k", Seq("x", "y"))
      .head().getString(1) === "changed")
  }

  test("diff(corpus, upsert(corpus, delta)) explains exactly the delta") {
    val corpus = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("k", "v")
    val delta = Seq((2L, "TWO"), (3L, "three"), (9L, "nine")).toDF("k", "v")
    val merged = Merge.upsert(corpus, delta, "k")
    val d = Snapshot.diff(corpus, merged, "k", Seq("v"))
      .orderBy("k").as[(Long, String)].collect().toSeq
    // 2 rewritten, 3 re-upserted with identical content (unchanged),
    // 9 new, 1 untouched; nothing removed
    assert(d === Seq(1L -> "unchanged", 2L -> "changed",
      3L -> "unchanged", 9L -> "added"))
  }

  test("diff over two bucketed corpus tables runs with zero exchanges") {
    // the docstring's scale claim, asserted: snapshots written with
    // writeBucketed on the diff key join full-outer WITHOUT any
    // shuffle — the exchange happened once, at write time
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val cur = docs.filter(col("doc_id") % 13 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, lit("rewritten"))
          .otherwise(col("text")).as("text"))
    graft.io.Sources.writeBucketed(docs, "graft_snap_old", "doc_id", 4)
    graft.io.Sources.writeBucketed(cur, "graft_snap_cur", "doc_id", 4)
    val d = Snapshot.diff(spark.table("graft_snap_old"),
      spark.table("graft_snap_cur"), "doc_id", Seq("text"))
    val rows = d.collect() // finalizes AQE
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val plan = d.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val exchanges = graft.PlanAudit.flatten(plan)
      .count(_.isInstanceOf[ShuffleExchangeExec])
    assert(exchanges === 0, s"bucketed snapshot diff shuffled:\n$plan")
    // and the bucketed path computes the same diff as the direct one
    val direct = Snapshot.diff(docs, cur, "doc_id", Seq("text")).collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSet ===
      direct.map(r => (r.getLong(0), r.getString(1))).toSet)
  }

  test("diffSummary counts per status") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val cur = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "v")
    val got = Snapshot.diffSummary(old, cur, "k", Seq("v"))
      .as[(String, Long)].collect().toMap
    assert(got === Map("unchanged" -> 1L, "changed" -> 1L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("scd2: three-version chain produces the right intervals") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val v2 = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "v") // 2 changed, 3 removed, 4 added
    val v3 = Seq((1L, "a"), (2L, "B"), (4L, "D"), (3L, "c2")).toDF("k", "v") // 4 changed, 3 back
    val o1 = Snapshot.scd2Init(v1, 1L)
    val (o2, c2) = Snapshot.scd2Apply(o1, v2, "k", Seq("v"), 2L)
    val (o3, c3) = Snapshot.scd2Apply(o2, v3, "k", Seq("v"), 3L)
    val history = Snapshot.scd2History(o3, c2.unionByName(c3))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(history === Set(
      (1L, "a", 1L, -1L),            // never touched: still the v1 interval
      (2L, "b", 1L, 2L),             // closed by the v2 change
      (2L, "B", 2L, -1L),
      (3L, "c", 1L, 2L),             // removed at v2...
      (3L, "c2", 3L, -1L),           // ...reborn at v3 with new content
      (4L, "d", 2L, 3L),             // v2 row closed by the v3 change
      (4L, "D", 3L, -1L)))
  }

  test("scd2: re-applying the same snapshot closes nothing") {
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val o1 = Snapshot.scd2Init(v1, 1L)
    val (o2, closed) = Snapshot.scd2Apply(o1, v1, "k", Seq("v"), 2L)
    assert(closed.count() === 0L)
    // survivors keep their ORIGINAL valid_from — the open row is
    // untouched, not rewritten with the new version
    val froms = o2.select("valid_from").as[Long].collect().toSeq
    assert(froms === Seq(1L, 1L))
  }

  test("scd2: as-of filter reconstructs each version exactly") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val v2 = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "v")
    val o1 = Snapshot.scd2Init(v1, 1L)
    val (o2, c2) = Snapshot.scd2Apply(o1, v2, "k", Seq("v"), 2L)
    val hist = Snapshot.scd2History(o2, c2)
    def asOf(v: Long) = hist.filter(col("valid_from") <= v &&
        (col("valid_to").isNull || col("valid_to") > v))
      .select("k", "v").as[(Long, String)].collect().toSet
    assert(asOf(1L) === Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(asOf(2L) === Set((1L, "a"), (2L, "B"), (4L, "d")))
  }
}
