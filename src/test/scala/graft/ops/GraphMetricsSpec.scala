package graft.ops

import graft.SparkSpec

class GraphMetricsSpec extends SparkSpec {
  import spark.implicits._

  // two triangles sharing edge 2–3, plus pendant 5–1
  private val clean = Seq(
    (1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (5L, 1L))

  private val expected = Seq(
    (1L, 3L, 1L, 0.333333), (2L, 3L, 2L, 0.666667),
    (3L, 3L, 2L, 0.666667), (4L, 2L, 1L, 1.0), (5L, 1L, 0L, 0.0))

  private def run(edges: Seq[(Long, Long)]) =
    GraphMetrics.triangleCounts(edges.toDF("a", "b"))
      .orderBy("node")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq

  test("counts triangles and clustering coefficients exactly") {
    assert(run(clean) === expected)
  }

  test("self-loops, parallel and reversed edges don't change the answer") {
    val noisy = clean ++ Seq((2L, 1L), (1L, 1L), (3L, 2L), (2L, 3L), (4L, 4L))
    assert(run(noisy) === expected)
  }

  test("totalTriangles folds the per-node frame") {
    val got = GraphMetrics.totalTriangles(
        GraphMetrics.triangleCounts(clean.toDF("a", "b")))
      .collect()(0)
    assert((got.getLong(0), got.getLong(1)) === ((2L, 5L)))
  }

  test("triangle-free bipartite graph counts zero everywhere") {
    val bip = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L))
    assert(run(bip).forall(r => r._3 == 0L && r._4 == 0.0))
  }
}
