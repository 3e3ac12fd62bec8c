package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("rrf fuses two rankings by hand-computed reciprocal ranks") {
    // leg A ranks: 10 (r1), 20 (r2), 30 (r3); leg B: 20 (r1), 10 (r2)
    val a = Seq((10L, 0.9), (20L, 0.5), (30L, 0.1)).toDF("id", "score")
    val b = Seq((20L, 7.0), (10L, 3.0)).toDF("id", "score")
    val got = Retrieval.rrfFuse(Seq(a, b), "id", "score", k = 60)
      .as[(Long, Double)].collect().toMap
    def rr(rs: Int*) = BigDecimal(rs.map(r => 1.0 / (60 + r)).sum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Map(10L -> rr(1, 2), 20L -> rr(2, 1), 30L -> rr(3)))
  }

  test("ties within a leg break by ascending id, deterministically") {
    val a = Seq((5L, 1.0), (3L, 1.0), (9L, 1.0)).toDF("id", "score")
    val got = Retrieval.rrfFuse(Seq(a), "id", "score")
      .orderBy(desc("rrf"), col("id")).as[(Long, Double)].collect().map(_._1)
    // equal scores -> rank by id: 3 (r1) > 5 (r2) > 9 (r3)
    assert(got.toSeq === Seq(3L, 5L, 9L))
  }

  test("a doc present in only one leg still scores") {
    val a = Seq((1L, 2.0)).toDF("id", "score")
    val b = spark.emptyDataset[(Long, Double)].toDF("id", "score")
    val got = Retrieval.rrfFuse(Seq(a, b), "id", "score", k = 60)
      .as[(Long, Double)].collect().toMap
    assert(got.keySet === Set(1L))
    assert(math.abs(got(1L) - 1.0 / 61) < 1e-6)
  }

  test("hybridSearch: persisted BM25 + IVF legs fuse; zero index-side exchanges") {
    // two-topic corpus with BOTH a text and an embedding per doc:
    // topic A (ids 0-49) is "spark join table" text near vector
    // [1,0,..]; topic B (ids 50-99) is "mesh grid node" near [0,1,..]
    val corpus = (0 until 100).map { i =>
      if (i < 50)
        (i.toLong, s"spark join table alpha$i beta${i % 7}",
          Seq(10.0 + (i % 7), i % 5 * 0.5, 1.0, 0.0))
      else
        (i.toLong, s"mesh grid node gamma$i delta${i % 7}",
          Seq(i % 5 * 0.5, 10.0 + (i % 7), 0.0, 1.0))
    }.toDF("doc_id", "text", "vec")
    TextIndex.buildInvertedIndex(corpus, "doc_id", "text",
      "graft_hyb_inv", buckets = 4)
    Similarity.buildIvfIndex(corpus, "doc_id", "vec",
      "graft_hyb_ivf", nCells = 4, lloydIters = 2, buckets = 4)
    val qVec = Seq(10.0, 0.0, 1.0, 0.0)
    val fusedDf = Retrieval.hybridSearch(spark, "graft_hyb_inv",
      "graft_hyb_ivf", "spark join", qVec, k = 10, nprobe = 4,
      overfetch = 10)
    val fused = fusedDf
      .orderBy(desc("rrf"), col("doc_id"))
      .as[(Long, Double)].collect().toSeq
    assert(fused.nonEmpty)
    // both legs agree on topic A, so every fused doc — and certainly
    // the leaders — must be topic-A ids
    assert(fused.take(5).forall(_._1 < 50), s"topic B leaked: ${fused.take(5)}")
    // docs ranked by BOTH legs must outrank any single-leg doc of
    // equal ranks; minimally: top fused score needs two contributions
    assert(fused.head._2 > 1.0 / 61 + 1.0 / 70,
      s"top fused score ${fused.head._2} looks single-leg")

    // ONE plan walk over the fused query: neither persisted index is
    // wholesale-reshuffled (exchanges may move probe-bounded rows,
    // never an index scan directly). REAL post-AQE walk (r15) — the
    // former inputPlan-based walk was vacuous; see graft.PlanChecks.
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val wholesale =
      graft.PlanChecks.directlyShuffledScans(fusedDf, "graft_hyb_inv") ++
      graft.PlanChecks.directlyShuffledScans(fusedDf, "graft_hyb_ivf")
    assert(wholesale.isEmpty,
      s"index wholesale-reshuffled:\n${wholesale.mkString("\n")}")
    // and the postings probe is bucket-pruned, not a corpus scan
    // (scan metadata is present pre-AQE, so inputPlan is fine HERE)
    val plan = fusedDf.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case p => p
    }
    val planStr = plan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(planStr)
    assert(m.isDefined && m.get.group(1).toInt < m.get.group(2).toInt,
      s"postings probe not bucket-pruned:\n$planStr")

    // recall sanity: with every cell probed and generous overfetch,
    // the IVF leg must agree with brute-force cosine
    val sem = Similarity.ivfTopKAgainstIndex(spark, "graft_hyb_ivf",
        Seq(Tuple2(0L, qVec)).toDF("qid", "qv"), "qid", "qv",
        10, nprobe = 4, overfetch = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    val exact = Similarity.bruteForceTopK(corpus, "doc_id", "vec",
        Seq(Tuple2(0L, qVec)).toDF("qid", "qv"), "qid", "qv", 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert((sem & exact).size >= 8,
      s"IVF leg recall ${(sem & exact).size}/10 vs brute force")
  }

  test("mmrRerank at lambda=1 ≡ plain relevance top-k (ties to smaller id)") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val topk = Similarity.bruteForceTopKAgg(emb, "vec_id", "embedding",
      queries, "qid", "qv", 10)
    val mmr = Retrieval.mmrRerank(topk, emb, "vec_id", "embedding",
        kOut = 5, lambda = 1.0)
      .select(col("qid"), col("id"), col("mmr_rank").as("rank"))
    val plain = topk.filter(col("rank") <= 5).select("qid", "id", "rank")
    assert(mmr.collect().map(_.toString).sorted.toSeq ==
      plain.collect().map(_.toString).sorted.toSeq)
  }

  test("mmrRerank diversifies: a near-duplicate of the top hit is demoted") {
    // corpus: qid 0's query vector; ids 1,2 nearly identical to each
    // other and very relevant; id 3 a bit less relevant but DIFFERENT.
    // Pure relevance ranks (1, 2, 3); MMR at lambda=0.5 must pick the
    // diverse 3 before the duplicate 2.
    val corpus = Seq(
      (1L, Seq(1.0f, 0.05f, 0.0f)),
      (2L, Seq(1.0f, 0.06f, 0.0f)),
      (3L, Seq(0.8f, 0.0f, 0.6f))).toDF("id", "vec")
    val q = Seq((0L, Seq(1.0f, 0.0f, 0.0f))).toDF("qid", "qv")
    val topk = Similarity.bruteForceTopKAgg(corpus, "id", "vec",
      q, "qid", "qv", 3)
    val picked = Retrieval.mmrRerank(topk, corpus, "id", "vec",
        kOut = 3, lambda = 0.5)
      .orderBy("mmr_rank").select("id").as[Long].collect().toSeq
    assert(picked == Seq(1L, 3L, 2L), s"got $picked")
  }

  test("mmrRerank is deterministic and kOut-bounded") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val topk = Similarity.bruteForceTopKAgg(emb, "vec_id", "embedding",
      queries, "qid", "qv", 20)
    def run() = Retrieval.mmrRerank(topk, emb, "vec_id", "embedding",
        kOut = 5, lambda = 0.7)
      .collect().map(_.toString).sorted.toSeq
    val a = run()
    assert(a == run())
    assert(a.size == 5 * 5)
  }

  test("fused scores never compare raw leg scores across legs") {
    // leg scales differ by 1000x; fusion must depend only on ranks:
    // scaling one leg's scores changes nothing
    val a = Seq((1L, 0.001), (2L, 0.002)).toDF("id", "score")
    val aScaled = a.withColumn("score", col("score") * 1000)
    val b = Seq((2L, 5.0), (1L, 4.0)).toDF("id", "score")
    val x = Retrieval.rrfFuse(Seq(a, b), "id", "score").orderBy("id").collect()
    val y = Retrieval.rrfFuse(Seq(aScaled, b), "id", "score").orderBy("id").collect()
    assert(x.toSeq === y.toSeq)
  }
}
