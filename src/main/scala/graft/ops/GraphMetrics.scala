package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting and local clustering coefficients over an
  * undirected edge list — the graph-structure signals (community
  * density, link-farm detection) that complement [[PageRank]]'s
  * centrality and [[Components]]' connectivity when curating a
  * web-crawl host graph.
  *
  * Algorithm: degree-ordered edge orientation (the "compact-forward"
  * / Latapy 2008 scheme also used by every distributed triangle
  * counter since Suri & Vassilvitskii 2011). Every undirected edge is
  * directed from its lower endpoint to its higher endpoint in the
  * total order (degree, node); a triangle {a ≺ b ≺ c} then has
  * exactly the oriented edges a→b, a→c, b→c and is enumerated ONCE
  * as the wedge (b, c) at apex a closed by b→c.
  *
  * Why this survives 100× data: the naive wedge join keys on an
  * arbitrary endpoint, so a degree-D hub yields O(D²) wedge rows —
  * quadratic in the hottest key. Orienting by degree bounds every
  * node's OUT-degree by O(√m) (a node keeps only neighbors of equal
  * or higher degree), so wedge rows total O(m^{3/2}) worst case and
  * the per-key fan-out — hence the worst shuffle partition — is
  * bounded no matter how skewed the degree distribution is. All
  * joins are plain equi-joins on ids; nothing is collected.
  *
  * Output: one row per node — (node, degree, triangles, lcc) with
  * lcc = 2·triangles / (degree·(degree−1)) rounded to 6 dp (0.0 for
  * degree < 2). Exact, hence fully oracle-able by a triple
  * self-join at test scale.
  */
object GraphMetrics {

  /** Per-node exact triangle counts + local clustering coefficient.
    *
    * @param edges undirected edge list; self-loops dropped, parallel
    *              edges and reversed duplicates collapse via the
    *              canonical (least, greatest) form
    */
  def triangleCounts(edges: DataFrame, aCol: String = "a",
                     bCol: String = "b"): DataFrame = {
    val e = edges
      .select(least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val deg = e.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))

    // Orient u—v from lower to higher in the (deg, node) total order,
    // carrying the destination's degree so wedge endpoints can be
    // canonically ordered in the SAME total order downstream.
    val o = e
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          struct(col("u").as("src"), col("v").as("dst"), col("dv").as("ddst")))
          .otherwise(
            struct(col("v").as("src"), col("u").as("dst"), col("du").as("ddst")))
          .as("e"))
      .select(col("e.src"), col("e.dst"), col("e.ddst"))

    // Wedges at each apex: every unordered pair of out-neighbors,
    // ordered by (deg, node) so the closing edge is oriented lo→hi.
    val w1 = o.select(col("src"), col("dst").as("lo"), col("ddst").as("dlo"))
    val w2 = o.select(col("src"), col("dst").as("hi"), col("ddst").as("dhi"))
    val wedges = w1.join(w2, "src")
      .filter(struct(col("dlo"), col("lo")) < struct(col("dhi"), col("hi")))
      .select(col("src").as("apex"), col("lo"), col("hi"))
    val tri = wedges.join(
      o.select(col("src").as("lo"), col("dst").as("hi")), Seq("lo", "hi"))

    val perNode = tri
      .select(explode(array(col("apex"), col("lo"), col("hi"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg").as("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        round(when(col("deg") >= 2,
          lit(2.0) * coalesce(col("triangles"), lit(0L)) /
            (col("deg") * (col("deg") - lit(1L))))
          .otherwise(lit(0.0)), 6).as("lcc"))
  }

  /** Global triangle count — one aggregate over [[triangleCounts]]'s
    * per-node frame (each triangle contributes 3 node rows).
    */
  def totalTriangles(perNode: DataFrame): DataFrame =
    perNode.agg((sum("triangles") / 3L).cast("long").as("n_triangles"),
      count(lit(1)).as("n_nodes"))
}
