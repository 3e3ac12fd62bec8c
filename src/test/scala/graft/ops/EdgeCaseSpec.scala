package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degenerate-input behavior: every operator must return an empty
  * (correctly-schemed) result on empty input, never throw.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  lazy val emptyDocs = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
  lazy val emptyVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")

  test("dedup ops on empty input") {
    assert(Dedup.exactDedup(emptyDocs, "text", "doc_id").count() == 0)
    assert(Dedup.minhashPairs(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.simhashPairs(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.blockedJaccardPairs(emptyDocs, "doc_id", "text", "source", 1, 0.8).count() == 0)
  }

  test("similarity ops on empty corpus") {
    val q = Seq((0L, Array(1.0f, 0.0f))).toDF("qid", "qv")
    assert(Similarity.bruteForceTopK(emptyVecs, "vec_id", "embedding", q, "qid", "qv", 5).count() == 0)
    assert(Similarity.bruteForceTopKAgg(emptyVecs, "vec_id", "embedding", q, "qid", "qv", 5).count() == 0)
    assert(Similarity.lshTopK(emptyVecs, "vec_id", "embedding", q, "qid", "qv", 5).count() == 0)
    assert(Similarity.cosinePairs(emptyVecs, "vec_id", "embedding", 0.5).count() == 0)
  }

  test("sessionize and asof on empty input") {
    val emptyEvents = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(graft.streaming.Sessionize.sessionize(emptyEvents).count() == 0)
    val left = Seq((1L, 5L, "L")).toDF("k", "t", "lid")
    val emptyRight = Seq.empty[(Long, Long, String)].toDF("k", "t", "rid")
    val out = AsOf.asofJoinLeft(left, emptyRight, "k", "t", "t", "rid").collect()
    assert(out.length == 1 && out.head.getAs[String]("right_rid") == null)
  }

  test("text analysis on empty and whitespace strings") {
    val df = Seq("", "   ", "\t\n").toDF("text")
    val out = df.select(
      TextAnalysis.wsTokenCount($"text").as("n"),
      TextAnalysis.qualityScore($"text").as("q"),
      TextAnalysis.langId($"text").as("l"),
      TextAnalysis.fingerprint($"text").as("fp")).collect()
    out.foreach { r =>
      assert(r.getInt(0) == 0)
      assert(!r.isNullAt(1))
      assert(r.getString(2) == "de") // all-zero tie -> alphabetical
    }
  }

  test("chunking, mixture, token budget, and incremental dedup on empty input") {
    assert(Chunking.chunkByTokens(emptyDocs, "doc_id", "text", 32, 24).count() == 0)
    assert(Sampling.mixtureSample(emptyDocs, "source", "text",
      Map("a" -> 0.5), 0.1).count() == 0)
    assert(Sampling.tokenBudgetCap(emptyDocs, "source", "doc_id", "text", 100L).count() == 0)
    val one = Seq((1L, "some text here", "s")).toDF("doc_id", "text", "source")
    assert(Dedup.minhashPairsAgainst(emptyDocs, one, "doc_id", "text").count() == 0)
    assert(Dedup.minhashPairsAgainst(one, emptyDocs, "doc_id", "text").count() == 0)
    // a delta against an empty corpus survives intact
    assert(Dedup.dedupIncrement(emptyDocs, one, "doc_id", "text").count() == 1)
  }

  test("substring dedup and BPE on empty and degenerate input") {
    assert(Dedup.duplicateSpans(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.duplicateCoverage(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.stripDuplicateSpans(emptyDocs, "doc_id", "text").count() == 0)
    // docs shorter than the gram size: no spans, zero coverage,
    // text passes through the strip untouched
    val short = Seq((1L, "just three words"), (2L, "just three words"))
      .toDF("doc_id", "text")
    assert(Dedup.duplicateSpans(short, "doc_id", "text", n = 8).count() == 0)
    val stripped = Dedup.stripDuplicateSpans(short, "doc_id", "text", n = 8)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(stripped.forall(_ == ("just three words", 0L)))
    // BPE: training on an empty corpus yields an empty merge table;
    // counting with it still works (every word = its char count)
    val m = Bpe.train(emptyDocs, "text", numMerges = 10)
    assert(m.merges.isEmpty)
    assert(Bpe.bpeTokenCounts(emptyDocs, "doc_id", "text", m).count() == 0)
    val counted = Bpe.bpeTokenCounts(short, "doc_id", "text", m)
      .collect().map(_.getLong(1))
    assert(counted.forall(_ == 14L)) // 4+5+5 chars
    assert(Bpe.bpeChunk(emptyDocs, "doc_id", "text", m, 16).count() == 0)
  }

  test("IVF index on empty corpus and empty delta") {
    val q = Seq((0L, Array(1.0f, 0.0f))).toDF("qid", "qv")
    // empty corpus: index builds (empty tables, dim 0), serving
    // returns empty instead of throwing, and an append of real
    // vectors onto a dim-0 index is rejected loudly
    Similarity.buildIvfIndex(emptyVecs, "vec_id", "embedding", "graft_test_empty_ivf",
      nCells = 4, buckets = 2)
    assert(Similarity.ivfTopKAgainstIndex(spark, "graft_test_empty_ivf",
      q, "qid", "qv", 5).count() == 0)
    // empty DELTA onto a real index is a no-op
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", "graft_test_edge_ivf",
      nCells = 4, buckets = 2)
    val before = spark.table("graft_test_edge_ivf_cells").count()
    Similarity.appendToIvfIndex(spark, "graft_test_edge_ivf",
      emptyVecs, "vec_id", "embedding")
    assert(spark.table("graft_test_edge_ivf_cells").count() == before)
  }

  test("chunking and budget ops treat null text as empty rather than throw") {
    val df = Seq((1L, "alpha beta gamma", "s"), (2L, null, "s"))
      .toDF("doc_id", "text", "source")
    // null text = empty document: exactly one empty chunk
    val chunks = Chunking.chunkByTokens(df, "doc_id", "text", 4, 2).collect()
    assert(chunks.map(_.getLong(0)).toSet == Set(1L, 2L))
    val nullChunks = chunks.filter(_.getLong(0) == 2L)
    assert(nullChunks.length == 1)
    assert(nullChunks.head.getAs[String]("chunk_text") == "")
    assert(nullChunks.head.getAs[Long]("chunk_tokens") == 0L)
    // null text sorts into the window but contributes null tokens:
    // the cumulative sum treats it as absent, keeping real docs
    val kept = Sampling.tokenBudgetCap(df, "source", "doc_id", "text", 100L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L))
    // null source takes the default mixture rate without throwing
    val ns = Seq((1L, "alpha beta", null.asInstanceOf[String]))
      .toDF("doc_id", "text", "source")
    assert(Sampling.mixtureSample(ns, "source", "text", Map("a" -> 0.0), 1.0).count() == 1)
  }

  test("round-9 operators on empty input") {
    // quantile sketch family: empty sketch, empty quantiles, empty MAD
    val emptyGV = Seq.empty[(String, Long)].toDF("g", "v")
    assert(QuantileSketch.sketch(emptyGV, "g", "v").count() == 0)
    assert(QuantileSketch.quantiles(
      QuantileSketch.sketch(emptyGV, "g", "v"), "g", Seq((1, 2))).count() == 0)
    assert(QuantileSketch.groupMad(emptyGV, "g", "v").count() == 0)
    // maintained stats: empty-state fold against a real delta
    val delta = Seq(("a", 3L)).toDF("g", "v")
    val folded = Merge.maintainGroupStats(
      Merge.groupStats(emptyGV, "g", "v"), delta, "g", "v").collect()
    assert(folded.length == 1 && folded.head.getLong(1) == 1L)
    // HTML extraction: empty and null html
    val h = Seq((1L, ""), (2L, null.asInstanceOf[String])).toDF("id", "h")
    val cleaned = h.select(col("id"),
      HtmlExtract.cleanLines(col("h")).as("l")).collect()
    assert(cleaned.find(_.getLong(0) == 1L).get.getSeq[String](1).isEmpty)
    assert(cleaned.find(_.getLong(0) == 2L).get.isNullAt(1))
    // trained lang-ID: single-language corpus predicts that language
    val one = Seq((1L, "aa", "common words here now"),
      (2L, "aa", "more common words now")).toDF("id", "lang", "text")
    val m = LangModel.fit(one, "lang", "text", topK = 20)
    assert(m.langs == Seq("aa"))
    val p = LangModel.predict(one, "id", "text", m).collect()
    assert(p.forall(_.getString(1) == "aa"))
    // maintained HLL registers: empty state absorbs a delta untouched
    val regs = Profiling.hllRegisters(Seq(("g", "k1")).toDF("g", "k"), "g", "k")
    val foldedRegs = Profiling.maintainHllRegisters(regs.limit(0), regs)
    assert(foldedRegs.collect().toSeq ==
      regs.collect().toSeq)
  }
}
