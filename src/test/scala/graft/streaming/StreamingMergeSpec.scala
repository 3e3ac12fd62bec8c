package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamingMergeSpec extends SparkSpec {
  import spark.implicits._

  test("streamed CDC merge across micro-batches equals the one-shot upsertDelete") {
    val corpus = (1L to 20L).map(i => (i, s"doc$i")).toDF("k", "v")
    // one delta row per key: updates on 3|k, an insert, tombstones on
    // 7|k — spread across 4 chunks so upserts and deletes land in
    // different micro-batches
    val deltas = (
      (3L to 18L by 3L).map(i => (i, s"upd$i", false)) ++
      Seq((99L, "new99", false)) ++
      Seq(7L, 14L).map(i => (i, "", true))
    ).toDF("k", "v", "is_delete")
    val streamed = StreamingMerge.maintainedCorpus(corpus, deltas, "k",
        "is_delete", nChunks = 4)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    val oneShot = graft.ops.Merge.upsertDelete(corpus,
        deltas.filter(!$"is_delete").select("k", "v"),
        deltas.filter($"is_delete").select("k"), "k")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(streamed.toSeq === oneShot.toSeq)
    val byKey = streamed.toMap
    assert(byKey(3L) == "upd3" && byKey(99L) == "new99" && byKey(1L) == "doc1")
    assert(!byKey.contains(7L) && !byKey.contains(14L))
  }

  test("duplicate delta keys fail loudly before any micro-batch runs") {
    // a key upserted twice would silently become last-write-wins in the
    // replay while the one-shot merge keeps both rows — the whole-frame
    // contract check must reject it up front
    val corpus = Seq((1L, "a")).toDF("k", "v")
    val dup = Seq((2L, "first", false), (3L, "x", false),
        (2L, "second", false)).toDF("k", "v", "is_delete")
    val e = intercept[IllegalArgumentException] {
      StreamingMerge.maintainedCorpus(corpus, dup, "k", "is_delete",
        nChunks = 3)
    }
    assert(e.getMessage.contains("duplicate"), e.getMessage)
  }
}
