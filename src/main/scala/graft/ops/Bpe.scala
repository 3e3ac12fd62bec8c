package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenization (the public BPE algorithm of
  * Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
  * Words with Subword Units"): train a merge table on the corpus
  * itself, then count/segment text in learned-subword units — the
  * unit a training pipeline actually budgets in, next to the
  * whitespace and regex token counts of `TextAnalysis`.
  *
  * Scale design (100 TB): BPE is applied per DISTINCT WORD, never per
  * occurrence. The distinct-word table of even a web corpus is orders
  * of magnitude smaller than the corpus, so the expensive symbolic
  * merge loop runs once per vocabulary entry (a bounded `mapPartitions`
  * over the distinct-word frame — the same escalation rung as the
  * media codecs: a per-row algorithmic loop no Column expression
  * expresses), and per-occurrence cost is one narrow (word → piece
  * count) join. Training aggregates (word, count) map-side — the
  * driver only ever holds the bounded top-`maxWords` vocabulary, the
  * same O(model) driver state as the tree learners' node stats.
  *
  * Everything is deterministic: vocabulary order, pair-count
  * tie-breaks and the merge loop are all total orders, so the learned
  * merge table — and therefore every count — is reproducible on any
  * partitioning, and the per-word piece counts are renderable as a
  * lookup table for a cross-engine oracle (the fit-query pattern).
  */
object Bpe {

  /** An ordered merge table; application follows lowest-rank-first
    * (the standard greedy BPE encode).
    */
  case class BpeModel(merges: Seq[(String, String)]) extends Serializable {
    @transient private lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    /** Segment one word into its BPE pieces: start from characters,
      * repeatedly merge the adjacent pair with the lowest merge rank
      * (all its occurrences, left to right) until no mergeable pair
      * remains. Total for ANY word, also ones unseen in training.
      */
    def encode(word: String): Vector[String] = {
      var syms = word.map(_.toString).toVector
      var done = syms.length < 2
      while (!done) {
        var best = Int.MaxValue
        var i = 0
        while (i < syms.length - 1) {
          val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < best) best = r
          i += 1
        }
        if (best == Int.MaxValue) done = true
        else {
          val (a, b) = merges(best)
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
              out += a + b; j += 2
            } else { out += syms(j); j += 1 }
          }
          syms = out.result()
          done = syms.length < 2
        }
      }
      syms
    }

    def pieceCount(word: String): Int = encode(word).length
  }

  /** Train a merge table on the corpus's whitespace words: bounded
    * deterministic vocabulary (top `maxWords` by count, ties by word),
    * then classic weighted pair counting driver-side. Stops early when
    * no adjacent pair occurs at least twice (weighted).
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 65536): BpeModel = {
    val wc = df
      .select(explode(TextAnalysis.wsTokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainOnCounts(wc, numMerges)
  }

  /** The driver-side merge loop over a (word, count) vocabulary. */
  def trainOnCounts(wordCounts: Seq[(String, Long)], numMerges: Int): BpeModel = {
    var words: Seq[(Vector[String], Long)] =
      wordCounts.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val merges = Seq.newBuilder[(String, String)]
    var made = 0
    var exhausted = false
    while (made < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      // deterministic argmax: highest weighted count, ties by pair
      val candidates = pairCounts.filter(_._2 >= 2L)
      if (candidates.isEmpty) exhausted = true
      else {
        val (bestPair, _) = candidates.minBy { case ((a, b), c) => (-c, a, b) }
        merges += bestPair
        words = words.map { case (syms, c) =>
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 &&
                syms(j) == bestPair._1 && syms(j + 1) == bestPair._2) {
              out += bestPair._1 + bestPair._2; j += 2
            } else { out += syms(j); j += 1 }
          }
          (out.result(), c)
        }
        made += 1
      }
    }
    BpeModel(merges.result())
  }

  /** Persist a trained merge table as a catalog table (rank, a, b) —
    * the tokenizer artifact every training pipeline ships alongside
    * its data. Tiny (numMerges rows), so an unbucketed managed table.
    */
  def saveModel(spark: org.apache.spark.sql.SparkSession,
                model: BpeModel, table: String): Unit = {
    import spark.implicits._
    graft.io.Sources.writeTable(
      model.merges.zipWithIndex.map { case ((a, b), r) => (r, a, b) }
        .toDF("rank", "a", "b"),
      table)
  }

  /** Load a persisted merge table; rank order restored explicitly
    * (table scan order is not a contract).
    */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
                table: String): BpeModel =
    BpeModel(spark.table(table).orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq)

  /** A deterministic piece→id assignment over a model + alphabet:
    * id 0 is reserved for unknown pieces (characters never seen in
    * training), ids 1..C are the sorted alphabet, C+1.. the merge
    * products in merge-rank order (first occurrence wins when two
    * merge paths produce the same string). Fully derived from
    * (alphabet, merges), so the id space is reproducible anywhere
    * the model artifact travels.
    */
  case class BpeVocab(pieces: Seq[String]) extends Serializable {
    @transient lazy val idOf: Map[String, Int] =
      pieces.zipWithIndex.map { case (p, i) => (p, i + 1) }.toMap
    def id(piece: String): Int = idOf.getOrElse(piece, 0)
    /** Total id count including the reserved unk id 0. */
    def size: Int = pieces.size + 1
  }

  def vocabOf(model: BpeModel, alphabet: Seq[String]): BpeVocab =
    BpeVocab((alphabet.sorted ++
      model.merges.map { case (a, b) => a + b }).distinct)

  /** The corpus's character alphabet (driver-side — bounded by the
    * charset, not the corpus; the same O(model) driver state as the
    * merge table itself).
    */
  def alphabetOf(df: DataFrame, textCol: String): Seq[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(explode(split(regexp_replace(col(textCol), "\\s", ""), ""))
        .as("ch"))
      .filter(length(col("ch")) > 0)
      .distinct().as[String].collect().toSeq.sorted
  }

  /** Encode every document to its BPE TOKEN-ID sequence — the id
    * stream a training pipeline actually feeds a model, completing
    * the tokenizer surface (counts → budget/chunking; ids → batches).
    * Per-distinct-word encoding (the 100 TB contract of this file:
    * the merge loop runs once per vocabulary entry, per-occurrence
    * cost is one narrow word→ids join), then per-doc reassembly in
    * word order. Output: (doc_id, ids array<int>, n_tokens); empty
    * and null texts yield an empty array. Unknown characters encode
    * to the reserved unk id 0 (spec'd).
    */
  def encodeIds(df: DataFrame, idCol: String, textCol: String,
                model: BpeModel, vocab: BpeVocab): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val wordIds = df
      .select(explode(TextAnalysis.wsTokens(col(textCol))).as("w"))
      .distinct().as[String]
      .mapPartitions { it =>
        it.map(w => (w, model.encode(w).map(vocab.id).toArray))
      }
      .toDF("w", "wids")
    val perDoc = df
      .select(col(idCol).as("doc_id"),
        posexplode(TextAnalysis.wsTokens(col(textCol))).as(Seq("pos", "w")))
      .join(wordIds, "w")
      .groupBy("doc_id")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("wids")))),
        e => e.getField("wids"))).as("ids"))
    df.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("ids"), array().cast("array<int>")).as("ids"))
      .withColumn("n_tokens", size(col("ids")).cast("long"))
  }

  /** Per-word BPE piece counts for every DISTINCT word of the corpus:
    * (w, n_pieces). The merge loop runs once per vocabulary entry.
    */
  def wordPieceCounts(df: DataFrame, textCol: String,
                      model: BpeModel): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(explode(TextAnalysis.wsTokens(col(textCol))).as("w"))
      .distinct().as[String]
      .mapPartitions { it => it.map(w => (w, model.pieceCount(w))) }
      .toDF("w", "n_pieces")
  }

  /** Per-document BPE token count: explode words, join the distinct-
    * word piece counts, re-aggregate. Docs with no words (empty or
    * null text) report 0.
    */
  /** Tokenizer fertility by group (typically language): pieces per
    * word and chars per piece — the published tokenizer-bias metric
    * for multilingual corpora (a tokenizer trained mostly on one
    * language pays several× more pieces per word elsewhere, which
    * silently re-weights any token-budgeted mixture and inflates
    * serving cost; cf. Petrov et al. 2023, "Language Model Tokenizers
    * Introduce Unfairness Between Languages"). Output per group:
    * (group, n_words, n_pieces, fertility, chars_per_piece).
    *
    * Scale: the merge loop runs once per DISTINCT word (the
    * vocab-frame contract of [[bpeTokenCounts]]); occurrences join
    * the vocab frame and fold into one map-side-combined aggregate
    * per group.
    */
  def fertilityByGroup(df: DataFrame, groupCol: String, textCol: String,
                       model: BpeModel): DataFrame = {
    val pieces = wordPieceCounts(df, textCol, model)
    df.select(col(groupCol).as("g"),
        explode(TextAnalysis.wsTokens(col(textCol))).as("w"))
      .join(pieces, "w")
      .groupBy("g")
      .agg(count(lit(1)).as("n_words"),
        sum("n_pieces").as("n_pieces"),
        sum(length(col("w")).cast("long")).as("n_chars"))
      .select(col("g").as(groupCol), col("n_words"), col("n_pieces"),
        round(col("n_pieces").cast("double") / col("n_words"), 6)
          .as("fertility"),
        round(col("n_chars").cast("double") / col("n_pieces"), 6)
          .as("chars_per_piece"))
  }

  def bpeTokenCounts(df: DataFrame, idCol: String, textCol: String,
                     model: BpeModel): DataFrame = {
    val pieces = wordPieceCounts(df, textCol, model)
    val perDoc = df
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.wsTokens(col(textCol))).as("w"))
      .join(pieces, "w")
      .groupBy("doc_id").agg(sum("n_pieces").as("bpe_tokens"))
    df.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("bpe_tokens"), lit(0L)).as("bpe_tokens"))
  }

  // ---- byte-level BPE, GPT-2 convention (r13) -----------------------

  /** The GPT-2 `bytes_to_unicode` table (public, from the GPT-2
    * release): visible Latin-1 code points map to themselves, every
    * other byte to 256+n in first-gap order — so a byte string
    * round-trips through printable unicode chars and the SAME
    * char-symbol merge machinery above runs unchanged on bytes
    * (space becomes 'Ġ' = U+0120, the familiar GPT-2 marker).
    */
  val ByteToChar: Array[Char] = {
    val visible = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val map = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (visible(b)) map(b) = b.toChar
      else { map(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    map
  }

  /** UTF-8 bytes of `s`, one mapped char per byte. */
  def byteEncode(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) { sb.append(ByteToChar(bytes(i) & 0xFF)); i += 1 }
    sb.toString
  }

  /** The GPT-2 pre-tokenization split pattern, restricted to the
    * RE2-safe subset (no lookahead) so Spark (java.util.regex) and
    * the DuckDB oracle (RE2) tokenize IDENTICALLY: contractions,
    * optionally-space-prefixed letter/number/punctuation runs, then
    * whitespace runs. Documented departure from the published
    * pattern: GPT-2's `\s+(?!\S)` lookahead re-attaches the last
    * space of a run to the following word; without lookahead a
    * multi-space run stays one whitespace token — deterministic and
    * identical on both engines, which is the property the oracle
    * needs.
    */
  val ByteSplitPattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  @transient private lazy val splitRe =
    java.util.regex.Pattern.compile(ByteSplitPattern)

  /** Driver/executor-side pre-tokenizer (the regex above). */
  def preTokenize(text: String): Vector[String] = {
    if (text == null) Vector.empty
    else {
      val m = splitRe.matcher(text)
      val out = Vector.newBuilder[String]
      while (m.find()) out += m.group()
      out.result()
    }
  }

  /** Column-side pre-tokenizer — `regexp_extract_all` with the same
    * pattern (codegen'd; Java regex, pinned RE2-compatible above).
    */
  def preTokensCol(text: Column): Column =
    regexp_extract_all(coalesce(text, lit("")), lit(ByteSplitPattern), lit(0))

  /** The tokenizer abstraction the counting/fertility/budget surface
    * is parameterized over: how a document becomes countable tokens
    * and how many BPE pieces one token costs.
    */
  sealed trait Tokenizer extends Serializable {
    /** Tokens of a text column (array<string>). */
    def tokensCol(text: Column): Column
    /** BPE pieces of one token. */
    def pieceCount(token: String): Int
  }

  /** Whitespace words + char-symbol BPE (Sennrich et al. 2016). */
  final case class WordTokenizer(model: BpeModel) extends Tokenizer {
    def tokensCol(text: Column): Column = TextAnalysis.wsTokens(text)
    def pieceCount(token: String): Int = model.pieceCount(token)
  }

  /** GPT-2-convention byte level: regex pre-tokens, byte-mapped
    * symbols, merges over byte pairs.
    */
  final case class ByteTokenizer(model: BpeModel) extends Tokenizer {
    def tokensCol(text: Column): Column = preTokensCol(text)
    def pieceCount(token: String): Int = model.pieceCount(byteEncode(token))
  }

  /** Train a byte-level merge table: bounded deterministic PRE-TOKEN
    * vocabulary (top `maxWords` by count, ties by token), each
    * pre-token byte-mapped to char symbols, then the same driver-side
    * weighted merge loop — merges are over byte pairs, exactly the
    * GPT-2 training convention (minus their lookahead, see
    * [[ByteSplitPattern]]).
    */
  def trainBytes(df: DataFrame, textCol: String, numMerges: Int,
                 maxWords: Int = 65536): BpeModel = {
    val wc = df
      .select(explode(preTokensCol(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => (byteEncode(r.getString(0)), r.getLong(1))).toSeq
    trainOnCounts(wc, numMerges)
  }

  /** The byte tokenizer's id space: id 0 stays reserved (by
    * [[BpeVocab]] convention) but is UNREACHABLE — the alphabet is
    * all 256 byte symbols, so every string encodes with no unk (the
    * GPT-2 property that motivates byte level in the first place).
    */
  def byteVocab(model: BpeModel): BpeVocab =
    vocabOf(model, ByteToChar.map(_.toString).toSeq)

  /** Per-document BPE token-ID streams under the BYTE tokenizer —
    * the [[encodeIds]] shape over regex pre-tokens: per-DISTINCT-
    * pretoken encoding, one narrow pretoken→ids join, in-order
    * reassembly. Output (doc_id, ids array<int>, n_tokens); empty and
    * null texts yield an empty array; no id is ever the unk 0.
    */
  def encodeIdsBytes(df: DataFrame, idCol: String, textCol: String,
                     model: BpeModel): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vocab = byteVocab(model)
    val wordIds = df
      .select(explode(preTokensCol(col(textCol))).as("w"))
      .distinct().as[String]
      .mapPartitions { it =>
        it.map(w => (w, model.encode(byteEncode(w)).map(vocab.id).toArray))
      }
      .toDF("w", "wids")
    val perDoc = df
      .select(col(idCol).as("doc_id"),
        posexplode(preTokensCol(col(textCol))).as(Seq("pos", "w")))
      .join(wordIds, "w")
      .groupBy("doc_id")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("wids")))),
        e => e.getField("wids"))).as("ids"))
    df.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("ids"), array().cast("array<int>")).as("ids"))
      .withColumn("n_tokens", size(col("ids")).cast("long"))
  }

  /** Per-DISTINCT-token piece counts under any tokenizer — the
    * vocab-frame contract generalized: (w, n_pieces).
    */
  def pieceCounts(df: DataFrame, textCol: String, tok: Tokenizer): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(explode(tok.tokensCol(col(textCol))).as("w"))
      .distinct().as[String]
      .mapPartitions { it => it.map(w => (w, tok.pieceCount(w))) }
      .toDF("w", "n_pieces")
  }

  /** Per-document BPE token count under any tokenizer (the
    * [[bpeTokenCounts]] shape, tokenizer-parameterized).
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String,
                  tok: Tokenizer): DataFrame = {
    val pieces = pieceCounts(df, textCol, tok)
    val perDoc = df
      .select(col(idCol).as("doc_id"),
        explode(tok.tokensCol(col(textCol))).as("w"))
      .join(pieces, "w")
      .groupBy("doc_id").agg(sum("n_pieces").as("bpe_tokens"))
    df.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("bpe_tokens"), lit(0L)).as("bpe_tokens"))
  }

  /** Tokenizer fertility by group under any tokenizer (the
    * [[fertilityByGroup]] shape, tokenizer-parameterized; for the
    * byte tokenizer "word" means pre-token and chars include the
    * attached leading space — the convention fertility comparisons
    * across tokenizers must share).
    */
  def fertilityByGroupWith(df: DataFrame, groupCol: String, textCol: String,
                           tok: Tokenizer): DataFrame = {
    val pieces = pieceCounts(df, textCol, tok)
    df.select(col(groupCol).as("g"),
        explode(tok.tokensCol(col(textCol))).as("w"))
      .join(pieces, "w")
      .groupBy("g")
      .agg(count(lit(1)).as("n_words"),
        sum("n_pieces").as("n_pieces"),
        sum(length(col("w")).cast("long")).as("n_chars"))
      .select(col("g").as(groupCol), col("n_words"), col("n_pieces"),
        round(col("n_pieces").cast("double") / col("n_words"), 6)
          .as("fertility"),
        round(col("n_chars").cast("double") / col("n_pieces"), 6)
          .as("chars_per_piece"))
  }

  /** Chunk each document into word-boundary chunks of at most
    * `maxTokens` BPE tokens, greedy first-fit in word order (a chunk
    * closes when the next word would overflow it; only a single word
    * heavier than the whole budget ever exceeds it). The per-doc
    * sequential packing state is a codegen'd linear pass
    * (`Native.greedyChunkIndices`) over the doc's piece-count array —
    * a window/HOF formulation is either wrong (fixed cumulative
    * boundaries overfill up to 2× the budget on straddling words) or
    * quadratic (fold with array accumulator). Two doc-keyed shuffles:
    * re-assemble word order after the piece-count join, then group
    * (doc, chunk). Output: (doc_id, chunk_no, chunk_text, n_tokens).
    */
  def bpeChunk(df: DataFrame, idCol: String, textCol: String,
               model: BpeModel, maxTokens: Int): DataFrame = {
    require(maxTokens > 0)
    val pieces = wordPieceCounts(df, textCol, model)
    val perDoc = df
      .select(col(idCol).as("doc_id"),
        posexplode(TextAnalysis.wsTokens(col(textCol))).as(Seq("pos", "w")))
      .join(pieces, "w")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(
        struct(col("pos"), col("w"), col("n_pieces")))).as("ws"))
      .withColumn("ci", graft.functions.Native.greedyChunkIndices(
        transform(col("ws"), e => e.getField("n_pieces")), lit(maxTokens)))
    perDoc
      .select(col("doc_id"), explode(arrays_zip(col("ws"), col("ci"))).as("z"))
      .select(col("doc_id"), col("z.ci").as("chunk_no"),
        col("z.ws.pos").as("pos"), col("z.ws.w").as("w"),
        col("z.ws.n_pieces").as("n_pieces"))
      .groupBy("doc_id", "chunk_no")
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("w")))),
          e => e.getField("w"))).as("chunk_text"),
        sum("n_pieces").as("n_tokens"))
  }
}
