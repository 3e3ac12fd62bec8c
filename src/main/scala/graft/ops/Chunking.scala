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
}
