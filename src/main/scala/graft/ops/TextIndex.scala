package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted positional inverted text index + phrase search — the
  * classic IR structure (Zobel & Moffat 2006, "Inverted files for
  * text search engines") re-expressed as a bucketed Spark table, the
  * third member of the persisted-index family next to the MinHash
  * band index (`Dedup.buildBandIndex`) and the IVF ANN index
  * (`Similarity.buildIvfIndex`).
  *
  * Layout: `<name>_postings(token, doc_id, positions)` — one row per
  * (token, document), positions sorted ascending — bucketed AND
  * sorted by `token`, plus `<name>_meta(tokenizer)` carrying the
  * build-time tokenization so a probe can never silently mix
  * tokenizers (the parameter-drift hazard the band/IVF `_meta`
  * tables exist to prevent).
  *
  * Scale shape (100 TB corpus): the index is written once per corpus
  * version (one shuffle, at write time); a phrase probe reads ONLY
  * the buckets holding the phrase's tokens (Spark bucket pruning on
  * the `token IN (...)` filter — `SelectedBucketsCount` in the scan
  * node, spec-asserted), so probe cost is O(postings of the queried
  * tokens), never a corpus scan. Adjacency is then one aggregation
  * over those postings keyed on (doc_id, aligned start) — the
  * standard positional-intersection query plan, with the alignment
  * map joined in as a broadcast literal frame (≤ phrase-length
  * rows). Daily deltas append new (token, doc_id) rows into the same
  * bucket layout (`appendToInvertedIndex`) — doc_ids are disjoint
  * across deltas so append never rewrites history; compaction
  * (`Sources.compactBucketed`) bounds file counts.
  */
object TextIndex {

  private val Tokenizer = "ws" // TextAnalysis.wsTokens

  /** Build the persisted index over `df`. One wide shuffle
    * (posexplode → groupBy token,doc) then the bucketed write; the
    * postings write IS the bucket shuffle, so the whole build is a
    * single exchange of the exploded token stream.
    */
  def buildInvertedIndex(df: DataFrame, idCol: String, textCol: String,
                         name: String, buckets: Int = 32): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.io.Sources.writeTable(
      Seq(Tokenizer).toDF("tokenizer"), s"${name}_meta")
    graft.io.Sources.writeBucketed(
      postings(df, idCol, textCol), s"${name}_postings", "token", buckets)
  }

  /** Append a delta corpus's postings into the existing bucket
    * layout. Caller contract (same as the band/IVF appends): delta
    * doc ids are disjoint from the corpus's — re-ingesting an id
    * would leave two postings rows for it rather than replacing.
    */
  def appendToInvertedIndex(spark: SparkSession, name: String,
                            delta: DataFrame, idCol: String,
                            textCol: String): Unit = {
    requireMeta(spark, name)
    val buckets = spark.sql(s"DESCRIBE EXTENDED `${name}_postings`")
      .filter(col("col_name") === "Num Buckets")
      .collect().headOption.map(_.getString(1).trim.toInt).getOrElse(32)
    graft.io.Sources.appendBucketed(
      postings(delta, idCol, textCol), s"${name}_postings", "token", buckets)
  }

  /** Compact after many appends; probe plans unchanged. */
  def compactInvertedIndex(spark: SparkSession, name: String): Unit =
    graft.io.Sources.compactBucketed(spark, s"${name}_postings", "token")

  private def postings(df: DataFrame, idCol: String,
                       textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
        posexplode(TextAnalysis.wsTokens(col(textCol)))
          .as(Seq("pos", "token")))
      .groupBy("token", "doc_id")
      .agg(sort_array(collect_list(col("pos"))).as("positions"))

  private def requireMeta(spark: SparkSession, name: String): Unit = {
    val rows = spark.table(s"${name}_meta").collect()
    require(rows.length == 1 && rows(0).getString(0) == Tokenizer,
      s"index $name: malformed or incompatible ${name}_meta")
  }

  /** Documents containing `token`, with its term frequency —
    * `(doc_id, tf)`. A one-bucket pruned scan, no joins.
    */
  def tokenSearch(spark: SparkSession, name: String,
                  token: String): DataFrame = {
    requireMeta(spark, name)
    spark.table(s"${name}_postings")
      .filter(col("token") === token)
      .select(col("doc_id"), size(col("positions")).cast("long").as("tf"))
  }

  /** Exact phrase occurrences per document — `(doc_id, n_matches)`,
    * only docs with ≥ 1 match. The phrase is tokenized with the
    * index's own tokenizer (validated via `_meta`).
    *
    * Plan: prune the postings scan to the phrase's tokens, broadcast
    * the (token, offset) alignment frame (phrase-length rows; a
    * repeated token carries one row per offset), align every
    * occurrence to its implied phrase start (`pos - offset`), and
    * count aligned hits: a start position where ALL `p` offsets are
    * present is a match. Positions are distinct within a posting row,
    * so the count per (doc_id, start) is exact with no dedup step.
    */
  def phraseSearch(spark: SparkSession, name: String,
                   phrase: String): DataFrame = {
    requireMeta(spark, name)
    import spark.implicits._
    val toks = phrase.split("\\s+").filter(_.nonEmpty).toSeq
    require(toks.nonEmpty, "phraseSearch: empty phrase")
    val p = toks.length
    val offsets = toks.zipWithIndex.toDF("token", "offset")
    spark.table(s"${name}_postings")
      .filter(col("token").isin(toks.distinct: _*))
      .join(broadcast(offsets), "token")
      .select(col("doc_id"),
        explode(col("positions")).as("pos"), col("offset"))
      .select(col("doc_id"), (col("pos") - col("offset")).as("start"))
      .filter(col("start") >= 0)
      .groupBy("doc_id", "start").count()
      .filter(col("count") === p)
      .groupBy("doc_id").agg(count(lit(1)).as("n_matches"))
  }
}
