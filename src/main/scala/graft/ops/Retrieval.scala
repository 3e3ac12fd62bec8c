package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — combining a lexical ranking
  * (BM25 over [[TextIndex]]) with a semantic one (ANN cosine over
  * [[Similarity]]) is how training-data curation actually retrieves:
  * decontamination sweeps, eval-set mining, and targeted corpus
  * slicing all run "find documents like THIS" with both a keyword
  * and an embedding leg, then fuse.
  *
  * Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009,
  * "Reciprocal rank fusion outperforms Condorcet and individual rank
  * learning methods"): fused(d) = Σ_rankings 1/(k + rank_i(d)).
  * RRF is the standard choice because it needs NO score calibration
  * across legs — BM25 scores and cosine similarities live on
  * incomparable scales, but ranks always fuse.
  *
  * Scale shape: inputs are retrieval RESULT SETS (top-N per leg —
  * bounded by construction, never corpus-sized), so the per-leg rank
  * assignment is a window over at most a few thousand narrow rows
  * and the fusion is one map-side-combined aggregate over the union.
  * Nothing here touches the corpus; the expensive part of hybrid
  * search is the legs themselves, which keep their own scale
  * machinery (bucket-pruned index probes, IVF cells).
  */
object Retrieval {

  /** Fuse rankings by RRF. Each input is `(id, score)` — scores are
    * only used to ORDER within that leg (descending, ties broken by
    * ascending id, so the ranking is total and cross-engine
    * deterministic); they are never compared across legs.
    *
    * Output: `(id, rrf)` with rrf = Σ 1/(k + rank_leg(id)) rounded
    * to 6 dp, summed over the legs that ranked the id at all.
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, scoreCol: String,
              k: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k >= 0, s"rrf k must be >= 0: $k")
    // unpartitioned window is deliberate: a retrieval result set is
    // top-N bounded, so one task sorting it is the cheapest plan
    val w = Window.orderBy(col("s").desc, col("id").asc)
    val ranked = rankings.map { r =>
      r.select(col(idCol).as("id"), col(scoreCol).as("s"))
        .select(col("id"), row_number().over(w).as("r"))
    }
    ranked.reduce(_ unionAll _)
      .groupBy("id")
      .agg(round(sum(lit(1.0) / (lit(k) + col("r"))), 6).as("rrf"))
  }

  /** The production hybrid-retrieval composition this file's header
    * promises: a lexical BM25 leg against a PERSISTED inverted index
    * ([[TextIndex.bm25]], bucket-pruned postings probe) and a
    * semantic ANN leg against a PERSISTED int8 IVF index
    * ([[Similarity.ivfTopKAgainstIndex]], probed cells only), each
    * bounded to its top `k`, fused by [[rrfFuse]].
    *
    * Output: (doc_id, rrf), the fused ranking over docs either leg
    * surfaced. Both legs keep their zero-index-side-exchange probe
    * plans (spec'd in one plan walk over the fused query); the only
    * new work fusion adds is two ≤ k-row rank windows and one
    * map-side-combined aggregate — nothing corpus-sized. Doc ids
    * must be the same key space in both indexes (the caller built
    * them from the same corpus — the usual contract).
    */
  def hybridSearch(spark: org.apache.spark.sql.SparkSession,
                   textIndexName: String, ivfIndexName: String,
                   queryText: String, queryVec: Seq[Double],
                   k: Int = 20, nprobe: Int = 4, overfetch: Int = 4,
                   rrfK: Int = 60): DataFrame = {
    import spark.implicits._
    require(k > 0, s"hybridSearch needs k > 0: $k")
    val lex = TextIndex.bm25(spark, textIndexName, queryText)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
    val sem = Similarity.ivfTopKAgainstIndex(spark, ivfIndexName,
        Seq(Tuple2(0L, queryVec)).toDF("qid", "qv"), "qid", "qv",
        k, nprobe, overfetch)
      .select(col("id").as("doc_id"), col("cos").as("score"))
    rrfFuse(Seq(lex, sem), "doc_id", "score", rrfK)
      .withColumnRenamed("id", "doc_id")
  }

  /** Maximal-Marginal-Relevance re-ranking (Carbonell & Goldstein,
    * SIGIR'98) — the serving-stage DIVERSIFICATION step: from a
    * relevance-ranked candidate list, greedily keep
    *
    *   argmax_c  λ·rel(c) − (1−λ)·max_{s ∈ selected} sim(c, s)
    *
    * so near-duplicate hits don't crowd the final k (retrieval's
    * answer to the dedup problem; for training-data mining it is the
    * diversity-sampling primitive). Input is a top-k table
    * (qid, id, rel) — BOUNDED by construction, the k-list contract of
    * [[Similarity.marginFromTopK]] — plus the vectors for similarity;
    * each query's greedy loop runs over its OWN ≤list-size candidate
    * set inside one executor task (queries distribute, candidates
    * never shuffle past the gather).
    *
    * Determinism (the oracle contract): relevance and pairwise
    * cosines are micro-integerized BEFORE any comparison; MMR scores
    * derive from those integers through identical double arithmetic
    * on any engine, ties break to the smaller id, and the pairwise
    * cosine replicates [[VectorOps.cosine]]'s exact formula
    * (ascending-index dot folds) — so the whole greedy unrolls into
    * SQL CTEs and hash-matches.
    *
    * Output: (qid, id, mmr_rank 1..kOut, mmr_score rounded 6dp).
    */
  def mmrRerank(topk: DataFrame, corpus: DataFrame, idCol: String,
                vecCol: String, kOut: Int, lambda: Double = 0.7): DataFrame = {
    require(kOut > 0 && lambda > 0.0 && lambda <= 1.0,
      s"bad mmrRerank params kOut=$kOut lambda=$lambda")
    val spark = topk.sparkSession
    import spark.implicits._
    val oneMinus = 1.0 - lambda
    val cand = topk.select(col("qid").cast("long").as("qid"),
        col("id").cast("long").as("id"),
        round(col("cos") * 1e6).cast("long").as("relm"))
      .join(corpus.select(col(idCol).cast("long").as("id"),
        graft.ops.VectorOps.toDoubleVec(col(vecCol)).as("v")), "id")
    cand.groupBy("qid")
      .agg(collect_list(struct(col("id"), col("relm"), col("v"))).as("cands"))
      .as[(Long, Seq[(Long, Long, Seq[Double])])]
      .flatMap { case (qid, cands) =>
        val cs = cands.sortBy(c => (-c._2, c._1)).toArray // rel DESC, id ASC
        def dot(a: Seq[Double], b: Seq[Double]): Double = {
          var s = 0.0; var i = 0
          while (i < a.length) { s += a(i) * b(i); i += 1 }
          s
        }
        def simm(a: Seq[Double], b: Seq[Double]): Long = {
          val d = math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))
          val c = if (d == 0.0) 0.0 else dot(a, b) / d
          new java.math.BigDecimal(c * 1e6)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
        }
        val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int, Double)]
        var rank = 1
        while (rank <= kOut && selected.size < cs.length) {
          var bestIdx = -1; var bestScore = Double.NegativeInfinity
          var i = 0
          while (i < cs.length) {
            if (!selected.contains(i)) {
              var ms = Long.MinValue
              selected.foreach { s =>
                val m = simm(cs(i)._3, cs(s)._3)
                if (m > ms) ms = m
              }
              val score =
                if (selected.isEmpty) lambda * (cs(i)._2 / 1e6)
                else lambda * (cs(i)._2 / 1e6) - oneMinus * (ms / 1e6)
              // exact-score tie → smaller id (the SQL window's
              // ORDER BY score DESC, id)
              if (score > bestScore ||
                  (score == bestScore && bestIdx >= 0 &&
                    cs(i)._1 < cs(bestIdx)._1)) {
                bestScore = score; bestIdx = i
              }
            }
            i += 1
          }
          selected += bestIdx
          out += ((qid, cs(bestIdx)._1, rank, bestScore))
          rank += 1
        }
        out.toSeq
      }
      .toDF("qid", "id", "mmr_rank", "score")
      .select(col("qid"), col("id"), col("mmr_rank"),
        round(col("score"), 6).as("mmr_score"))
  }
}
