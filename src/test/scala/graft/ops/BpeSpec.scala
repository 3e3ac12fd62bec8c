package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merge training and greedy encode follow the public algorithm exactly") {
    // one word "aaaa" with weight 3: pair (a,a) counts 3x3=9 -> first
    // merge; then (aa,aa) counts 3 -> second merge; then nothing pairs
    val m = Bpe.trainOnCounts(Seq(("aaaa", 3L)), numMerges = 10)
    assert(m.merges == Seq(("a", "a"), ("aa", "aa")), m.merges.toString)
    assert(m.encode("aaaa") == Vector("aaaa"))
    // greedy lowest-rank-first: "aaa" -> [aa, a] (rank-0 merge wins
    // left-to-right, the leftover a cannot pair)
    assert(m.encode("aaa") == Vector("aa", "a"))
    // unseen word: only the learned merges apply
    assert(m.encode("baab") == Vector("b", "aa", "b"))
    assert(m.encode("") == Vector.empty)
    // training stops when no pair reaches weighted count 2
    val m2 = Bpe.trainOnCounts(Seq(("ab", 1L)), numMerges = 10)
    assert(m2.merges.isEmpty)
  }

  test("per-doc BPE counts aggregate distinct-word piece counts") {
    val m = Bpe.trainOnCounts(Seq(("aaaa", 3L)), numMerges = 10)
    val docs = Seq[(java.lang.Long, String)](
      (1L, "aaaa aaa b"),   // 1 + 2 + 1 = 4 pieces
      (2L, "aaaa aaaa"),    // 2
      (3L, ""),             // no words
      (4L, null)            // null text
    ).toDF("doc_id", "text")
    val got = Bpe.bpeTokenCounts(docs, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 4L, 2L -> 2L, 3L -> 0L, 4L -> 0L), got.toString)
  }

  test("encodeIds: ordered id stream, deterministic vocab, unk -> 0") {
    val m = Bpe.trainOnCounts(Seq(("aaaa", 3L)), numMerges = 10)
    // vocab deliberately EXCLUDES 'z': alphabet a,b -> ids: 0=unk,
    // 1='a', 2='b', then merge products 3='aa', 4='aaaa'
    val vocab = Bpe.vocabOf(m, Seq("a", "b"))
    assert(vocab.pieces === Seq("a", "b", "aa", "aaaa"))
    assert(vocab.id("aa") === 3 && vocab.id("z") === 0)
    val docs = Seq[(java.lang.Long, String)](
      (1L, "aaaa b aaa"),  // [aaaa] [b] [aa, a] -> 4 2 3 1
      (2L, "zb"),          // [z, b] -> 0 2 (unk char hits id 0)
      (3L, "")).toDF("doc_id", "text")
    val byId = Bpe.encodeIds(docs, "doc_id", "text", m, vocab)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toList, r.getLong(2)))
    assert(byId(0) === ((1L, List(4, 2, 3, 1), 4L)))
    assert(byId(1) === ((2L, List(0, 2), 2L)))
    assert(byId(2) === ((3L, Nil, 0L)))
    // ids decode back to the encode() pieces via the vocab table
    val pieces = byId(0)._2.filter(_ > 0).map(i => vocab.pieces(i - 1))
    assert(pieces.mkString === "aaaabaaa".replace(" ", ""))
  }

  test("model persistence round-trips merges in rank order") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val m = Bpe.train(docs, "text", numMerges = 30)
    assert(m.merges.nonEmpty)
    Bpe.saveModel(spark, m, "graft_test_bpe")
    val loaded = Bpe.loadModel(spark, "graft_test_bpe")
    assert(loaded.merges == m.merges, "rank order must survive persistence")
    // counts computed with the loaded model are identical
    val a = Bpe.bpeTokenCounts(docs, "doc_id", "text", m)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Bpe.bpeTokenCounts(docs, "doc_id", "text", loaded)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("bpeChunk: word-boundary chunks bounded by the budget, text preserved") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val m = Bpe.train(docs, "text", numMerges = 50)
    val maxTok = 16
    val chunks = Bpe.bpeChunk(docs, "doc_id", "text", m, maxTok)
      .persist()
    assert(chunks.filter(col("n_tokens") > maxTok).count() == 0,
      "every chunk must respect the budget")
    // concatenating a doc's chunks in order reproduces its token stream
    val rebuilt = chunks
      .groupBy("doc_id")
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("chunk_no"), col("chunk_text")))),
        e => e.getField("chunk_text"))).as("t2"))
    val orig = docs.select(col("doc_id"),
      concat_ws(" ", graft.ops.TextAnalysis.wsTokens(col("text"))).as("t1"))
    val mismatched = orig.join(rebuilt, "doc_id")
      .filter(col("t1") =!= col("t2")).count()
    assert(mismatched == 0, "chunk concatenation must reproduce the token stream")
    // chunk token totals agree with the per-doc counts
    val sums = chunks.groupBy("doc_id").agg(sum("n_tokens").as("s"))
    val counts = Bpe.bpeTokenCounts(docs, "doc_id", "text", m)
    assert(counts.join(sums, "doc_id")
      .filter(col("s") =!= col("bpe_tokens")).count() == 0)
    chunks.unpersist()
  }
}
