package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], damping: Double = 0.85,
                    iterations: Int = 3, tol: Double = 0.0): Map[Long, Double] =
    PageRank.pageRank(edges.toDF("src", "dst"), damping, iterations, tol)
      .as[(Long, Double)].collect().toMap

  /** Driver-side reference implementation of the same fixed-point
    * formula — an independent derivation, not a copy of the plan. */
  private def refRanks(edges: Seq[(Long, Long)], damping: Double,
                       iterations: Int): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toDouble
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toDouble }
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 0 until iterations) {
      val dangling = nodes.filterNot(outdeg.contains).map(r).sum
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / outdeg(src) }.sum
      }
      r = nodes.map(nd => nd ->
        ((1.0 - damping) / n +
          damping * (contrib.getOrElse(nd, 0.0) + dangling / n))).toMap
    }
    r
  }

  test("matches an independent driver-side power iteration (incl. dangling mass)") {
    // 1,2,3 feed 4; 4 is DANGLING (no out-edges) so its mass must
    // teleport back each round; 5->1 closes a side loop
    val edges = Seq((1L, 4L), (2L, 4L), (3L, 4L), (5L, 1L), (1L, 2L))
    val got = ranks(edges, iterations = 4)
    val want = refRanks(edges, 0.85, 4)
    assert(got.keySet == want.keySet)
    for ((k, v) <- want) assert(math.abs(got(k) - v) < 1e-12, s"node $k")
  }

  test("ranks always sum to 1 (dangling mass is redistributed, not leaked)") {
    // all-dangling extreme: a star where only the center has out-edges
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L))
    assert(math.abs(ranks(star, iterations = 5).values.sum - 1.0) < 1e-9)
    val chain = (0L until 10L).map(i => (i, i + 1))
    assert(math.abs(ranks(chain, iterations = 5).values.sum - 1.0) < 1e-9)
  }

  test("the sink of a funnel outranks its feeders") {
    val funnel = Seq((1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L))
    val r = ranks(funnel, iterations = 3)
    assert(r(9L) > r(1L) * 2, s"sink should dominate: $r")
  }

  test("multi-edges weight the walk (documented multigraph semantics)") {
    // 1 links twice to 2, once to 3: 2 gets 2/3 of 1's mass
    val r = ranks(Seq((1L, 2L), (1L, 2L), (1L, 3L)), iterations = 1)
    assert(r(2L) > r(3L))
    // hand-computed: outdeg(1)=3 edge rows, node 2 receives 2 of
    // them (2/9); nodes 2,3 are dangling after init (mass 2/3, so
    // 2/9 teleports to each node)
    val want2 = (1.0 - 0.85) / 3 + 0.85 * (2.0 / 9 + 2.0 / 9)
    assert(math.abs(r(2L) - want2) < 1e-12)
  }

  test("tol early-exit converges to the same fixed point as many iterations") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    val exact = ranks(edges, iterations = 60)
    val early = ranks(edges, iterations = 200, tol = 1e-12)
    for ((k, v) <- exact) assert(math.abs(early(k) - v) < 1e-9, s"node $k")
  }

  test("iteration plan shuffles the rank vector, not the edge list") {
    // the edge side is pre-partitioned on src once; per-iteration
    // plans must not re-shuffle it. Proxy check: a 2-iteration run
    // over an edge list 100x the node count completes with the edge
    // checkpoint reused (no exception) and correct totals.
    val big = (0 until 2000).map(i => ((i % 20).toLong, ((i * 7) % 20).toLong))
    val r = ranks(big, iterations = 2)
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }
}
