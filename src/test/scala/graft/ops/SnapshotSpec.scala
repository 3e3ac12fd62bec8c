package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

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

  test("diffSummary counts per status") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val cur = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "v")
    val got = Snapshot.diffSummary(old, cur, "k", Seq("v"))
      .as[(String, Long)].collect().toMap
    assert(got === Map("unchanged" -> 1L, "changed" -> 1L,
      "removed" -> 1L, "added" -> 1L))
  }
}
