package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Byte-level BPE (GPT-2 convention, r13): the bytes_to_unicode
  * table, the RE2-safe split regex (pinned semantics incl. the
  * documented no-lookahead departure), byte-pair merges, and the
  * tokenizer-parameterized counting surface.
  */
class ByteBpeSpec extends SparkSpec {
  import spark.implicits._

  test("bytes_to_unicode: visible bytes map to themselves, space to the GPT-2 marker") {
    assert(Bpe.ByteToChar('a'.toInt) == 'a')
    assert(Bpe.ByteToChar('!'.toInt) == '!')
    assert(Bpe.ByteToChar(32) == 'Ġ', // 'Ġ'
      s"space mapped to ${Bpe.ByteToChar(32).toInt}")
    assert(Bpe.ByteToChar(0) == 'Ā')
    // bijective: 256 distinct chars
    assert(Bpe.ByteToChar.distinct.length == 256)
  }

  test("byteEncode: one symbol per UTF-8 byte") {
    assert(Bpe.byteEncode("ab") == "ab")
    assert(Bpe.byteEncode(" a") == "Ġa")
    // CJK chars are 3 UTF-8 bytes -> 3 symbols
    assert(Bpe.byteEncode("中").length == 3)
  }

  test("preTokenize: contractions, space-prefixed runs, pinned whitespace semantics") {
    assert(Bpe.preTokenize("Hello world's test") ==
      Vector("Hello", " world", "'s", " test"))
    assert(Bpe.preTokenize("a 12 b!") == Vector("a", " 12", " b", "!"))
    // documented RE2-safe departure: a multi-space run stays ONE
    // whitespace token (GPT-2's lookahead would split off the last
    // space onto the following word)
    assert(Bpe.preTokenize("a  b") == Vector("a", "  ", "b"))
    assert(Bpe.preTokenize(null) == Vector.empty)
    assert(Bpe.preTokenize("") == Vector.empty)
  }

  test("column pre-tokenizer matches the driver-side pre-tokenizer") {
    val texts = Seq("Hello world's  test", "a 12 b!", "中文 mixed", "")
    val got = texts.toDF("text")
      .select(Bpe.preTokensCol(col("text")).as("t"))
      .collect().map(_.getSeq[String](0).toVector)
    assert(got.toSeq == texts.map(Bpe.preTokenize))
  }

  test("byte-level training merges frequent byte pairs and reduces piece counts") {
    val docs = (0 until 50).map(i => (i.toLong, "the cat the hat the mat"))
      .toDF("doc_id", "text")
    val m0 = Bpe.trainBytes(docs, "text", numMerges = 0)
    val m8 = Bpe.trainBytes(docs, "text", numMerges = 8)
    val tok0 = Bpe.ByteTokenizer(m0)
    val tok8 = Bpe.ByteTokenizer(m8)
    // unmerged: one piece per byte (" the" = 4 bytes)
    assert(tok0.pieceCount(" the") == 4)
    assert(tok8.pieceCount(" the") < 4, "merges must compress ' the'")
    assert(m8.merges.nonEmpty && m8.merges == Bpe.trainBytes(docs, "text", 8).merges,
      "training must be deterministic")
  }

  test("tokenizer-parameterized counts: WordTokenizer reproduces bpeTokenCounts") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).limit(100)
    val model = Bpe.train(docs, "text", numMerges = 16)
    val generic = Bpe.tokenCounts(docs, "doc_id", "text",
        Bpe.WordTokenizer(model))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val legacy = Bpe.bpeTokenCounts(docs, "doc_id", "text", model)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(generic == legacy)
  }

  test("byte tokenizer end-to-end: counts cover every doc, empty text counts 0") {
    val docs = Seq((1L, "hello world"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val model = Bpe.trainBytes(docs, "text", numMerges = 4)
    val got = Bpe.tokenCounts(docs, "doc_id", "text", Bpe.ByteTokenizer(model))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(2L) == 0L && got(3L) == 0L && got(1L) > 0L)
  }

  test("encodeIdsBytes: ordered id stream, no unk ever, empty docs empty") {
    val docs = Seq((1L, "ab ab xy"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val model = Bpe.trainBytes(docs, "text", numMerges = 2)
    val got = Bpe.encodeIdsBytes(docs, "doc_id", "text", model)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toVector)).toMap
    assert(got(2L).isEmpty && got(3L).isEmpty)
    val ids = got(1L)
    assert(ids.nonEmpty && !ids.contains(0),
      s"byte alphabet covers all bytes — unk must be unreachable: $ids")
    // reassembly is pre-token ordered: decoding the id stream through
    // the vocab reproduces the byte-encoded text
    val vocab = Bpe.byteVocab(model)
    val pieces = ids.map(i => vocab.pieces(i - 1)).mkString
    assert(pieces == Bpe.byteEncode("ab ab xy"), pieces)
  }

  test("byte fertility: a tokenizer trained on one language pays more pieces elsewhere") {
    val en = (0 until 80).map(i => (i.toLong, "en", "the quick brown fox jumps over the lazy dog"))
    val zh = (0 until 20).map(i => (100L + i, "zh", "中文文本处理"))
    val docs = (en ++ zh).toDF("doc_id", "lang", "text")
    val model = Bpe.trainBytes(docs.filter(col("lang") === "en"), "text", 24)
    val fert = Bpe.fertilityByGroupWith(docs, "lang", "text",
        Bpe.ByteTokenizer(model))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(fert("zh") > fert("en"),
      s"en-trained tokenizer must be more fertile on zh: $fert")
  }
}
