package graft.ops

import graft.{PlanChecks, SparkSpec}
import org.apache.spark.sql.functions._

/** Lifecycle contract of the persisted graph-ANN index (r15 — the IVF
  * contract instantiated for the graph family): build-once serving ≡
  * the in-memory operators (NN-Descent is deterministic, so the
  * persisted adjacency IS the in-memory one), delta folds ≡ in-memory
  * `addToGraph`, compaction preserves served rows bit-exactly,
  * re-descent ≡ a fresh build, and serving never reshuffles the index
  * tables.
  */
class GraphIndexSpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
  lazy val queries = emb.filter(col("vec_id") % 25 === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qv"))

  private def rowSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("qid"), col("id"), col("rank"))
      .as[(Long, Long, Int)].collect().toSet

  private def adjSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("src"), col("dst"), col("rank"), round(col("cos"), 9))
      .collect().map(_.toString).toSet

  // built once, shared by the serve/plan/validation tests
  lazy val fullIndexBuilt: Boolean = {
    GraphIndex.buildGraphIndex(emb, "vec_id", "embedding", "graft_test_gidx",
      k = 8, layerMod = 4, iters = 3, buckets = 4)
    true
  }

  test("build once, serve without rebuild: flat all-seeds/0-hop ≡ brute force") {
    assert(fullIndexBuilt)
    val qs = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val served = GraphIndex.graphSearchAgainstIndex(spark, "graft_test_gidx",
      qs, "qid", "qv", k = 5, beam = 16, hops = 0, seedMod = 1)
    val brute = Similarity.bruteForceTopKAgg(emb, "vec_id", "embedding",
      qs, "qid", "qv", 5)
    assert(rowSet(served) == rowSet(brute),
      "all-seeds/0-hop against the index must BE brute force")
  }

  test("hierarchical serving against the index ≡ the in-memory operator, row for row") {
    assert(fullIndexBuilt)
    // the persisted adjacency is the in-memory one (deterministic
    // descent), so hier serving must return IDENTICAL rows — not just
    // comparable recall
    val inMemGraph = KnnGraph.nnDescent(emb, "vec_id", "embedding", 8,
      iters = 3)
    val inMemUpper = KnnGraph.upperLayerGraph(emb, "vec_id", "embedding", 8,
      iters = 3, layerMod = 4)
    val inMem = KnnGraph.graphSearchHier(inMemGraph, inMemUpper, emb,
      "vec_id", "embedding", queries, "qid", "qv", k = 5, beam = 32,
      hops = 2, entryBeam = 8, upperHops = 2, seedMod = 4)
    val served = GraphIndex.graphSearchHierAgainstIndex(spark,
      "graft_test_gidx", queries, "qid", "qv", k = 5, beam = 32, hops = 2,
      entryBeam = 8, upperHops = 2, seedMod = 4)
    assert(rowSet(served) == rowSet(inMem))
    // and the layered answer really clears the serving bar on its own
    val brute = Similarity.bruteForceTopKAgg(emb, "vec_id", "embedding",
      queries, "qid", "qv", 5)
    val hit = brute.select("qid", "id")
      .join(served.select("qid", "id"), Seq("qid", "id"), "left_semi").count()
    val recall = hit.toDouble / brute.count()
    assert(recall >= 0.9, s"index hier recall $recall < 0.9")
  }

  test("serving never reshuffles the index tables (final-plan walk)") {
    assert(fullIndexBuilt)
    // the REAL zero-index-side-exchange assertion: walk the executed
    // (post-AQE) plan — not inputPlan, which never contains exchanges
    // (see PlanChecks) — and require that no shuffle moves raw index
    // rows; only bounded beam/aggregate output may cross an exchange
    val served = GraphIndex.graphSearchHierAgainstIndex(spark,
      "graft_test_gidx", queries, "qid", "qv", k = 5, beam = 32, hops = 2,
      entryBeam = 8, upperHops = 2, seedMod = 4)
    val shuffled = PlanChecks.directlyShuffledScans(served, "graft_test_gidx")
    assert(shuffled.isEmpty, s"index tables reshuffled directly: $shuffled")
  }

  test("dim validation: mismatched queries and deltas are rejected") {
    assert(fullIndexBuilt)
    val bad = Seq((1L, Seq(1.0f, 2.0f))).toDF("qid", "qv")
    intercept[IllegalArgumentException] {
      GraphIndex.graphSearchAgainstIndex(spark, "graft_test_gidx",
        bad, "qid", "qv", k = 1, beam = 1, hops = 0)
    }
    intercept[IllegalArgumentException] {
      GraphIndex.addToGraphIndex(spark, "graft_test_gidx", bad, "qid", "qv")
    }
  }

  // ---- fold → compact → re-descent lifecycle on a base/delta split ----

  lazy val base = emb.filter(col("vec_id") % 5 =!= 0)
  lazy val delta = emb.filter(col("vec_id") % 5 === 0)

  lazy val foldDone: Boolean = {
    GraphIndex.buildGraphIndex(base, "vec_id", "embedding",
      "graft_test_gidx_fold", k = 8, layerMod = 4, iters = 4, buckets = 4)
    GraphIndex.addToGraphIndex(spark, "graft_test_gidx_fold", delta,
      "vec_id", "embedding")
    true
  }

  test("delta fold ≡ in-memory addToGraph, both layers; serving exact over the union") {
    assert(foldDone)
    // base layer: overlay-resolved adjacency == the in-memory fold of
    // the SAME deterministic inputs
    val g0 = KnnGraph.nnDescent(base, "vec_id", "embedding", 8, iters = 4)
    val inMem = KnnGraph.addToGraph(g0, base, delta, "vec_id", "embedding", 8)
    assert(adjSet(GraphIndex.resolveAdj(spark, "graft_test_gidx_fold", 0))
      == adjSet(inMem))
    // upper layer: promoted delta nodes folded in the same way
    val promote = pmod(xxhash64(col("vec_id")), lit(4)) === 0
    val upBase = base.filter(promote)
    val upDelta = delta.filter(promote)
    assert(!upDelta.isEmpty, "fixture must promote some delta nodes")
    val u0 = KnnGraph.nnDescent(upBase, "vec_id", "embedding", 8, iters = 4)
    val upInMem = KnnGraph.addToGraph(u0, upBase, upDelta,
      "vec_id", "embedding", 8)
    assert(adjSet(GraphIndex.resolveAdj(spark, "graft_test_gidx_fold", 1))
      == adjSet(upInMem))
    // the folded index serves the UNION corpus exactly at all-seeds/0-hop
    val qs = emb.filter(col("vec_id") % 5 === 0 && col("vec_id") < 30)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val served = GraphIndex.graphSearchAgainstIndex(spark,
      "graft_test_gidx_fold", qs, "qid", "qv", k = 5, beam = 16, hops = 0,
      seedMod = 1)
    val brute = Similarity.bruteForceTopKAgg(emb, "vec_id", "embedding",
      qs, "qid", "qv", 5)
    assert(rowSet(served) == rowSet(brute))
  }

  test("compactGraphIndex: served rows preserved bit-exactly, overlays reset") {
    assert(foldDone)
    def serve() = GraphIndex.graphSearchHierAgainstIndex(spark,
      "graft_test_gidx_fold", queries, "qid", "qv", k = 5, beam = 32,
      hops = 2, entryBeam = 8, upperHops = 2, seedMod = 4)
    val before = serve().select("qid", "id", "rank", "cos")
      .collect().map(_.toString).toSet
    val adjBefore = adjSet(GraphIndex.resolveAdj(spark,
      "graft_test_gidx_fold", 0))
    GraphIndex.compactGraphIndex(spark, "graft_test_gidx_fold")
    assert(spark.table("graft_test_gidx_fold_adj_delta").count() == 0)
    assert(spark.table("graft_test_gidx_fold_und_delta").count() == 0)
    val after = serve().select("qid", "id", "rank", "cos")
      .collect().map(_.toString).toSet
    assert(after == before, "compaction must not change served rows")
    assert(adjSet(GraphIndex.resolveAdj(spark, "graft_test_gidx_fold", 0))
      == adjBefore, "compaction must not change the effective adjacency")
  }

  test("refolding the same delta is a no-op: folds are idempotent") {
    assert(foldDone)
    val vecsBefore = spark.table("graft_test_gidx_fold_vecs").count()
    val adjBefore = adjSet(GraphIndex.resolveAdj(spark,
      "graft_test_gidx_fold", 0))
    // row count, not max(gen): this test may run after compaction
    // emptied the overlay, and the contract is the same either way —
    // nothing gets appended
    val overlayBefore = spark.table("graft_test_gidx_fold_adj_delta").count()
    // at-least-once delivery: the same delta arrives again (a retried
    // micro-batch, a re-run ingest job) — already-present ids drop, so
    // nothing is appended anywhere
    GraphIndex.addToGraphIndex(spark, "graft_test_gidx_fold", delta,
      "vec_id", "embedding")
    assert(spark.table("graft_test_gidx_fold_vecs").count() == vecsBefore,
      "re-ingest must not duplicate vectors")
    assert(spark.table("graft_test_gidx_fold_adj_delta").count()
      == overlayBefore, "re-ingest must not append overlay rows")
    assert(adjSet(GraphIndex.resolveAdj(spark, "graft_test_gidx_fold", 0))
      == adjBefore)
  }

  test("streamed micro-batch folds ≡ the one-shot batch fold") {
    // the r14 verdict's missing #5: deltas folded per micro-batch
    // inside foreachBatch. Determinism caveat: folding in TWO batches
    // is NOT required to equal one batch row-for-row (the second
    // batch searches a graph the first already extended), so the
    // contract asserted here is the serving one — every delta node
    // present, degree-bounded, union servable exactly at all-seeds
    GraphIndex.buildGraphIndex(base, "vec_id", "embedding",
      "graft_test_gidx_stream", k = 8, layerMod = 4, iters = 4, buckets = 4)
    graft.streaming.StreamingGraphIndex.streamedGraphMaintain(delta,
      "graft_test_gidx_stream", "vec_id", "embedding")
    val adj = GraphIndex.resolveAdj(spark, "graft_test_gidx_stream", 0)
    assert(adj.select("src").distinct().count() == emb.count(),
      "every union node must have adjacency after the streamed folds")
    assert(adj.groupBy("src").count().agg(max("count")).head().getLong(0) <= 8)
    val qs = emb.filter(col("vec_id") % 5 === 0 && col("vec_id") < 30)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val served = GraphIndex.graphSearchAgainstIndex(spark,
      "graft_test_gidx_stream", qs, "qid", "qv", k = 5, beam = 16,
      hops = 0, seedMod = 1)
    val brute = Similarity.bruteForceTopKAgg(emb, "vec_id", "embedding",
      qs, "qid", "qv", 5)
    assert(rowSet(served) == rowSet(brute))
  }

  test("redescentGraphIndex ≡ a fresh build over the current corpus") {
    assert(foldDone)
    GraphIndex.redescentGraphIndex(spark, "graft_test_gidx_fold", iters = 4)
    assert(spark.table("graft_test_gidx_fold_adj_delta").count() == 0)
    // deterministic descent: the rebuilt base layer IS nnDescent over
    // the full (base ∪ delta) corpus
    val fresh = KnnGraph.nnDescent(emb, "vec_id", "embedding", 8, iters = 4)
    assert(adjSet(GraphIndex.resolveAdj(spark, "graft_test_gidx_fold", 0))
      == adjSet(fresh))
    // and the pruned/re-mixed graph still clears the serving bar
    val served = GraphIndex.graphSearchHierAgainstIndex(spark,
      "graft_test_gidx_fold", queries, "qid", "qv", k = 5, beam = 32,
      hops = 2, entryBeam = 8, upperHops = 2, seedMod = 4)
    val brute = Similarity.bruteForceTopKAgg(emb, "vec_id", "embedding",
      queries, "qid", "qv", 5)
    val hit = brute.select("qid", "id")
      .join(served.select("qid", "id"), Seq("qid", "id"), "left_semi").count()
    val recall = hit.toDouble / brute.count()
    assert(recall >= 0.9, s"post-redescent recall $recall < 0.9")
  }
}
