package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KnnGraphSpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("bruteKnnGraph: exact neighbors on a known tiny geometry") {
    // four points on a line in 2-d: cosine orders by angle
    val df = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(1.0f, 0.1f)),
      (2L, Seq(1.0f, 0.2f)),
      (3L, Seq(0.0f, 1.0f))).toDF("id", "vec")
    val g = KnnGraph.bruteKnnGraph(df, "id", "vec", 1)
      .select("src", "dst").as[(Long, Long)].collect().toSet
    // node 1 (5.71°) is nearer to node 2 (11.31°, Δ5.60°) than to
    // node 0 (0°, Δ5.71°)
    assert(g == Set((0L, 1L), (1L, 2L), (2L, 1L), (3L, 2L)))
  }

  test("bruteKnnGraph emits k rows per node with deterministic tie-break") {
    val g = KnnGraph.bruteKnnGraph(emb, "vec_id", "embedding", 5)
    val counts = g.groupBy("src").count().select("count").distinct().as[Long].collect()
    assert(counts.toSeq == Seq(5L))
    assert(g.count() == 500L * 5)
  }

  test("nnDescent: recall grows per round and clears the isotropic-corpus bar") {
    // this corpus is isotropic random — the NN-Descent worst case
    // (neighbor-of-neighbor carries no signal; see the Scaladoc) —
    // so the honest bar is the measured plateau region, not the
    // ~0.9 the paper reports for real embedding spaces
    val exact = KnnGraph.bruteKnnGraph(emb, "vec_id", "embedding", 8)
      .persist()
    val r1 = KnnGraph.edgeRecall(
      KnnGraph.nnDescent(emb, "vec_id", "embedding", 8, iters = 1), exact)
    val approx = KnnGraph.nnDescent(emb, "vec_id", "embedding", 8, iters = 4)
    val r4 = KnnGraph.edgeRecall(approx, exact)
    assert(r4 >= 0.6, s"NN-Descent recall $r4 < 0.6 at 4 rounds")
    assert(r4 > r1 + 0.2, s"descent must actually descend: r1=$r1 r4=$r4")
    // adjacency stays k-bounded
    assert(approx.groupBy("src").count().agg(max("count")).head().getLong(0) <= 8)
    exact.unpersist()
  }

  test("nnDescent is deterministic across runs") {
    def run() = KnnGraph.nnDescent(emb, "vec_id", "embedding", 4, iters = 2)
      .select(col("src"), col("dst"), col("rank"), round(col("cos"), 9))
      .collect().map(_.toString).sorted.mkString("\n")
    assert(run() == run())
  }

  test("graphSearch at seedMod=1 (all seeds) ≡ brute-force top-k") {
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val graph = KnnGraph.nnDescent(emb, "vec_id", "embedding", 8, iters = 2)
    val served = KnnGraph.graphSearch(graph, emb, "vec_id", "embedding",
        queries, "qid", "qv", k = 5, beam = 16, hops = 0, seedMod = 1)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSet
    val brute = Similarity.bruteForceTopKAgg(emb, "vec_id", "embedding",
        queries, "qid", "qv", 5)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(served == brute)
  }

  test("graphSearch at production settings recalls ≥ 0.9 of exact top-k") {
    val queries = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val graph = KnnGraph.nnDescent(emb, "vec_id", "embedding", 8, iters = 3)
    val served = KnnGraph.graphSearch(graph, emb, "vec_id", "embedding",
      queries, "qid", "qv", k = 5, beam = 32, hops = 3, seedMod = 16)
    val brute = Similarity.bruteForceTopKAgg(emb, "vec_id", "embedding",
      queries, "qid", "qv", 5)
    val hit = brute.select("qid", "id")
      .join(served.select("qid", "id"), Seq("qid", "id"), "left_semi").count()
    val recall = hit.toDouble / brute.count()
    assert(recall >= 0.9, s"graphSearch recall $recall < 0.9")
  }

  test("graphSearchHier: layered entry points recall ≥ 0.9 with fewer base hops") {
    val queries = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val graph = KnnGraph.nnDescent(emb, "vec_id", "embedding", 8, iters = 3)
    val upper = KnnGraph.upperLayerGraph(emb, "vec_id", "embedding", 8,
      iters = 3, layerMod = 4)
    // the upper layer really is the hash-promoted sample
    val upperNodes = upper.select("src").distinct().count()
    assert(upperNodes > 0 && upperNodes < 250,
      s"upper layer should be ~N/4 of 500, got $upperNodes")
    val served = KnnGraph.graphSearchHier(graph, upper, emb, "vec_id",
      "embedding", queries, "qid", "qv", k = 5, beam = 32, hops = 2,
      entryBeam = 8, upperHops = 2, seedMod = 4)
    val brute = Similarity.bruteForceTopKAgg(emb, "vec_id", "embedding",
      queries, "qid", "qv", 5)
    val hit = brute.select("qid", "id")
      .join(served.select("qid", "id"), Seq("qid", "id"), "left_semi").count()
    val recall = hit.toDouble / brute.count()
    assert(recall >= 0.9, s"graphSearchHier recall $recall < 0.9")
    // shape: k rows per query, ranks 1..k, deterministic rerun
    assert(served.groupBy("qid").count().select("count")
      .distinct().as[Long].collect().toSeq == Seq(5L))
    val rerun = KnnGraph.graphSearchHier(graph, upper, emb, "vec_id",
      "embedding", queries, "qid", "qv", k = 5, beam = 32, hops = 2,
      entryBeam = 8, upperHops = 2, seedMod = 4)
    assert(rerun.select("qid", "id", "rank").as[(Long, Long, Int)]
      .collect().toSet ==
      served.select("qid", "id", "rank").as[(Long, Long, Int)]
        .collect().toSet)
  }

  test("addToGraph: incremental arrivals reach the bar without re-descending") {
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val delta = emb.filter(col("vec_id") % 5 === 0)
    val g0 = KnnGraph.nnDescent(base, "vec_id", "embedding", 8, iters = 4)
    val g1 = KnnGraph.addToGraph(g0, base, delta, "vec_id", "embedding", 8)
    // every union node present, degree k-bounded, no self-edges
    assert(g1.select("src").distinct().count() == emb.count())
    assert(g1.groupBy("src").count().agg(max("count")).head().getLong(0) <= 8)
    assert(g1.filter(col("src") === col("dst")).count() == 0)
    val probe = emb.filter(col("vec_id") % 4 === 0)
    val exact = KnnGraph.bruteKnnGraphFor(emb, probe, "vec_id", "embedding", 8)
      .persist()
    val incr = KnnGraph.edgeRecall(g1, exact)
    val scratch = KnnGraph.edgeRecall(
      KnnGraph.nnDescent(emb, "vec_id", "embedding", 8, iters = 4), exact)
    // the per-delta beam search is MORE thorough than a descent round
    // (measured 0.78 vs 0.70 here) — incremental must not lag a full
    // rebuild by more than noise
    assert(incr >= 0.6, s"incremental recall $incr < 0.6")
    assert(incr >= scratch - 0.05,
      s"incremental ($incr) must track the from-scratch build ($scratch)")
    // the arrivals themselves are well-connected
    val deltaRecall = KnnGraph.edgeRecall(g1,
      KnnGraph.bruteKnnGraphFor(emb, delta, "vec_id", "embedding", 8))
    assert(deltaRecall >= 0.6, s"delta-node recall $deltaRecall < 0.6")
    exact.unpersist()
  }

  test("coverageSelect: greedy picks the hub first, gains never increase") {
    // star 0-{1,2,3,4} plus a disjoint pair 10-11: the hub covers 5,
    // then the pair's smaller endpoint covers 2, then leftovers 0
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (10L, 11L))
      .toDF("src", "dst")
    val picks = KnnGraph.coverageSelect(edges, 3)
      .orderBy("pick_rank")
      .as[(Long, Int, Long)].collect().toSeq
    assert(picks == Seq((0L, 1, 5L), (10L, 2, 2L)),
      s"greedy must stop once everything is covered: $picks")
  }

  test("coverageSelect on the real 6-NN graph: distinct picks, monotone gains") {
    val sample = emb.filter(col("vec_id") % 4 === 0)
    val graph = KnnGraph.bruteKnnGraph(sample, "vec_id", "embedding", 6)
    def run() = KnnGraph.coverageSelect(graph, 5)
      .orderBy("pick_rank").as[(Long, Int, Long)].collect().toSeq
    val picks = run()
    assert(picks.size == 5)
    assert(picks.map(_._1).distinct.size == 5, "picks must be distinct")
    assert(picks.map(_._3) == picks.map(_._3).sorted.reverse,
      s"gains must be non-increasing: $picks")
    assert(picks.head._3 >= 7, "the first pick covers at least its closed 6-NN hood")
    assert(picks == run(), "greedy must be deterministic")
  }

  test("labelPropagate: converged scores decay along a chain from the seed") {
    // chain 1 — 2 — 3 — 4 with uniform weights; seed node 1 positive.
    // Run to convergence (α-contraction; a FEW iterations on a path
    // graph parity-oscillate — the classic bipartite sloshing — so
    // the monotone-decay claim holds at the fixed point, which is
    // what production labeling reads)
    val g = Seq((1L, 2L, 0.9), (2L, 3L, 0.9), (3L, 4L, 0.9))
      .toDF("src", "dst", "cos")
    val seeds = Seq((1L, 1.0)).toDF("vec_id", "s")
    val out = KnnGraph.labelPropagate(g, seeds, "vec_id", "s",
        iters = 40, alpha = 0.8)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    val scores = out.map(_._2)
    assert(out.head._3 && !out(1)._3)
    assert(scores(0) > scores(1) && scores(1) > scores(2) &&
      scores(2) > scores(3), s"must decay along the chain: ${scores.toSeq}")
    assert(scores.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("labelPropagate on the real graph: seeds stay high, deterministic") {
    val sample = emb.filter(col("vec_id") % 4 === 0)
    val graph = KnnGraph.bruteKnnGraph(sample, "vec_id", "embedding", 6)
    val seeds = sample.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id"), (col("label") < 5).cast("double").as("s"))
    def run() = KnnGraph.labelPropagate(graph, seeds, "vec_id", "s",
        iters = 3, alpha = 0.8)
      .orderBy("id").collect().map(_.toString).toSeq
    val a = run()
    assert(a == run(), "propagation must be bit-deterministic")
    val scored = KnnGraph.labelPropagate(graph, seeds, "vec_id", "s",
      iters = 3, alpha = 0.8)
    // a positive seed keeps at least its (1-alpha) clamp every round
    val seedMin = scored.filter(col("seeded"))
      .join(seeds.filter(col("s") === 1.0).select(col("vec_id").as("id")), "id")
      .agg(min("score")).head().getDouble(0)
    assert(seedMin >= 0.2, s"positive seeds must keep the damped floor: $seedMin")
    assert(scored.filter(col("score") < 0 || col("score") > 1).count() == 0)
  }

  test("labelPropagateMulti ≡ k independent binary labelPropagate runs + argmax") {
    // the k-ary kernel's contract: each class's spread is EXACTLY the
    // binary operator run on that class's one-hot seed vector, and the
    // final label is the argmax over those k runs (score desc, ties →
    // smaller class id). Recomputed here from k binary runs on the
    // real graph and compared row-for-row.
    val sample = emb.filter(col("vec_id") % 4 === 0)
    val graph = KnnGraph.bruteKnnGraph(sample, "vec_id", "embedding", 6)
      .persist()
    val seeds = sample.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id"), (col("label") % 3).cast("long").as("cls"))
    val multi = KnnGraph.labelPropagateMulti(graph, seeds, "vec_id", "cls",
        iters = 3, alpha = 0.8)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    // k binary runs: class c's seed vector is 1.0 on c-seeded nodes and
    // 0.0 on every OTHER seeded node (one-hot, not absent)
    val perClass = (0L to 2L).map { c =>
      val binSeeds = seeds.select(col("vec_id"),
        (col("cls") === c).cast("double").as("s"))
      c -> KnnGraph.labelPropagate(graph, binSeeds, "vec_id", "s",
          iters = 3, alpha = 0.8)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    val nodes = perClass.head._2.keySet
    assert(multi.keySet == nodes, "multi must cover exactly the graph's nodes")
    for (id <- nodes) {
      val (bestCls, bestScore) = perClass.map { case (c, m) => (c, m(id)) }
        .maxBy { case (c, s) => (s, -c) } // score desc, ties → smaller class
      val (gotCls, gotScore, _) = multi(id)
      assert(gotCls == bestCls && gotScore == bestScore,
        s"node $id: multi ($gotCls, $gotScore) != binary argmax ($bestCls, $bestScore)")
    }
    // seeded flag matches the seed table, not the winning class
    val seededIds = seeds.select("vec_id").as[Long].collect().toSet
    assert(nodes.forall(id => multi(id)._3 == seededIds.contains(id)))
    graph.unpersist()
  }

  test("labelPropagateMulti: equal-mass tie goes to the smaller class id") {
    // planted two-class-equal-mass fixture: node 3 sits symmetrically
    // between a class-0 seed (1) and a class-1 seed (2) with equal
    // weights, so its two class scores are bit-identical — the
    // deterministic tie-break must label it with the SMALLER class
    val g = Seq((1L, 3L, 0.8), (2L, 3L, 0.8)).toDF("src", "dst", "cos")
    val seeds = Seq((1L, 0L), (2L, 1L)).toDF("vec_id", "cls")
    val out = KnnGraph.labelPropagateMulti(g, seeds, "vec_id", "cls",
        iters = 3, alpha = 0.8)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L)._2 == 0L && byId(1L)._4, "seed 1 keeps class 0")
    assert(byId(2L)._2 == 1L && byId(2L)._4, "seed 2 keeps class 1")
    assert(byId(3L)._2 == 0L && !byId(3L)._4,
      s"the symmetric node's tie must break to class 0: ${byId(3L)}")
    // and the tie really was a tie: rerunning with the class ids
    // swapped must flip the label to the (new) smaller id
    val swapped = Seq((1L, 1L), (2L, 0L)).toDF("vec_id", "cls")
    val out2 = KnnGraph.labelPropagateMulti(g, swapped, "vec_id", "cls",
      iters = 3, alpha = 0.8).filter(col("id") === 3L).head()
    assert(out2.getLong(1) == 0L,
      "swapping seed classes must still label the tied node 0 — " +
        "proof the selection keys on class id, not seed order")
  }

  test("edgeRecall: identical graphs score 1.0, disjoint graphs 0.0") {
    val g = KnnGraph.bruteKnnGraph(emb.limit(50), "vec_id", "embedding", 3)
    assert(KnnGraph.edgeRecall(g, g) == 1.0)
    val shifted = g.select((col("src") + 10000).as("src"), col("dst"),
      col("rank"), col("cos"))
    assert(KnnGraph.edgeRecall(shifted, g) == 0.0)
  }
}
