package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")

  test("chunks cover every token with the configured overlap") {
    val w = 32; val s = 24
    val chunks = Chunking.chunkByTokens(docs, "doc_id", "text", w, s)
    val toks = docs.select(col("doc_id"),
      TextAnalysis.wsTokenCount(col("text")).cast("long").as("n"))

    val agg = chunks.groupBy("doc_id").agg(
      count(lit(1)).as("n_chunks"),
      sum("chunk_tokens").as("tok_sum"),
      max("chunk_tokens").as("max_tok"))
      .join(toks, "doc_id")
      .collect()

    assert(agg.nonEmpty)
    agg.foreach { r =>
      val (nChunks, tokSum, maxTok, n) =
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("tok_sum"),
         r.getAs[Long]("max_tok"), r.getAs[Long]("n"))
      // chunk count: starts at multiples of stride while start < n
      assert(nChunks == (n - 1) / s + 1, s"doc chunks $nChunks for $n tokens")
      assert(maxTok <= w)
      // chunk i holds min(w, n - i*stride) tokens
      val expectedTokSum = (0L until nChunks).map(i => math.min(w.toLong, n - i * s)).sum
      assert(tokSum == expectedTokSum, s"tok_sum $tokSum expected $expectedTokSum (n $n)")
    }
  }

  test("consecutive chunks overlap by window - stride tokens") {
    val w = 8; val s = 6
    val df = Seq((1L, (1 to 20).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val rows = Chunking.chunkByTokens(df, "doc_id", "text", w, s)
      .orderBy("chunk_idx").collect()
    assert(rows.length == 4) // starts 0, 6, 12, 18
    val texts = rows.map(_.getAs[String]("chunk_text").split(" ").toSeq)
    assert(texts(0) == (1 to 8).map(i => s"t$i"))
    assert(texts(1) == (7 to 14).map(i => s"t$i"))
    assert(texts(3) == (19 to 20).map(i => s"t$i")) // short tail
    // overlap check
    assert(texts(0).takeRight(2) == texts(1).take(2))
  }

  test("short and empty documents yield exactly one chunk") {
    val df = Seq((1L, "only three tokens"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val rows = Chunking.chunkByTokens(df, "doc_id", "text", 32, 24)
      .orderBy("doc_id").collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[String]("chunk_text") == "only three tokens")
    assert(rows(0).getAs[Long]("chunk_tokens") == 3L)
    assert(rows(1).getAs[String]("chunk_text") == "")
    assert(rows(1).getAs[Long]("chunk_tokens") == 0L)
    assert(rows(2).getAs[Long]("chunk_tokens") == 0L)
  }

  test("chunking plan is narrow: no exchange") {
    val chunks = Chunking.chunkByTokens(docs, "doc_id", "text", 32, 24)
    val plan = chunks.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("sequence packing: contiguous coverage, exact sequence count, deterministic") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val L = 64L
    val packed = Chunking.packSequences(docs, "source", "doc_id", "text", L)
      .persist()
    // the packed stream is exactly the concatenation: per source,
    // sequence count = ceil(total_tokens / L) and ranges are sane
    val perSource = packed.groupBy("source")
      .agg(sum("doc_tokens").as("tot"), (max("last_seq") + 1).as("nseq"))
      .collect()
    assert(perSource.nonEmpty)
    perSource.foreach { r =>
      val tot = r.getLong(1); val nseq = r.getLong(2)
      assert(nseq == (tot + L - 1) / L, s"source ${r.getString(0)}: $tot tokens, $nseq seqs")
    }
    assert(packed.filter(col("first_seq") > col("last_seq")).count() == 0)
    // a doc of t tokens spans exactly the sequences its offsets imply:
    // last - first <= t / L + 1
    assert(packed.filter(col("last_seq") - col("first_seq") >
      col("doc_tokens") / L + 1).count() == 0)
    // deterministic on re-run (content-hash order, no RNG)
    val again = Chunking.packSequences(docs, "source", "doc_id", "text", L)
    assert(packed.select("doc_id", "first_seq", "last_seq")
      .except(again.select("doc_id", "first_seq", "last_seq")).count() == 0)
    packed.unpersist()
  }
}
