package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window token chunking — the standard pre-training step
  * that turns variable-length documents into fixed-size training
  * chunks with overlap (reference has no counterpart; this is part of
  * the LLM-data-pipeline surface the brief asks for).
  *
  * Scale design: the whole operator is narrow — tokenize, explode the
  * chunk-start index range, slice. No shuffle, no state, fully
  * whole-stage-codegen'd; output size is sum(ceil(tokens/stride)),
  * linear in corpus size. The token array is computed ONCE per
  * document (it sits outside any HOF lambda — see SURVEY §5 on the
  * HOF-capture trap) and each chunk row slices the parent array by
  * (start, window) without re-tokenizing.
  */
object Chunking {

  /** One row per (document, chunk): `chunk_idx` (0-based), the
    * chunk's text re-joined with single spaces, and its token count.
    * Chunk i covers tokens [i·stride, i·stride + window); the last
    * chunk may be shorter. Empty (or null) documents yield one empty
    * chunk.
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    window: Int, stride: Int): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(stride > 0 && stride <= window,
      s"stride must be in [1, window], got $stride (window $window)")
    val starts = sequence(lit(0L),
      greatest(lit(0L),
        floor((col("_n") - 1).cast("double") / stride).cast("long")))
    df.select(col(idCol),
        TextAnalysis.wsTokens(coalesce(col(textCol), lit(""))).as("_toks"))
      .withColumn("_n", size(col("_toks")))
      .withColumn("chunk_idx", explode(starts))
      .withColumn("_chunk",
        slice(col("_toks"), (col("chunk_idx") * stride + 1).cast("int"), lit(window)))
      .select(col(idCol), col("chunk_idx"),
        concat_ws(" ", col("_chunk")).as("chunk_text"),
        size(col("_chunk")).cast("long").as("chunk_tokens"))
  }

  /** Training-sequence PACKING (the inverse of chunking): concatenate
    * each group's documents into one token stream — deterministic
    * content-hash order, the same portable ordering as
    * `Sampling.tokenBudgetCap` — and cut it at fixed `seqLen`
    * boundaries, the standard pack-then-cut shape of pre-training
    * batch construction (documents straddle sequence boundaries;
    * attention masking at doc joins is the consumer's concern). Each
    * doc row gains `doc_tokens`, `first_seq` and `last_seq` — the
    * contiguous range of training sequences it occupies within its
    * group. Empty docs occupy zero tokens of their starting sequence
    * (first_seq = last_seq).
    *
    * Scale: one window cumsum per group, exactly `tokenBudgetCap`'s
    * shape — groups (sources/shards) are the packing unit, so no
    * global single-task stream exists; a group's window is bounded by
    * that shard's size, the same sharding every production packer
    * uses.
    */
  def packSequences(df: DataFrame, groupCol: String, idCol: String,
                    textCol: String, seqLen: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(seqLen > 0)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(textCol)), col(idCol))
    df.withColumn("doc_tokens",
        coalesce(TextAnalysis.wsTokenCount(col(textCol)).cast("long"), lit(0L)))
      .withColumn("_cum", sum(col("doc_tokens")).over(w))
      .withColumn("first_seq",
        floor((col("_cum") - col("doc_tokens")).cast("double") / seqLen).cast("long"))
      .withColumn("last_seq",
        when(col("doc_tokens") === 0L, col("first_seq"))
          .otherwise(floor((col("_cum") - 1L).cast("double") / seqLen).cast("long")))
      .drop("_cum")
  }
}
