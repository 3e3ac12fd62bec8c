package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank over an edge list — the graph-centrality
  * signal large-scale corpus curation actually uses (host-graph
  * PageRank/harmonic centrality is a standard quality prior for web
  * crawls: a page on a well-linked host is worth more training mass
  * than an orphan spam domain). Complements [[Components]]: that
  * resolves near-dup GROUPS, this ranks nodes WITHIN a connected
  * web.
  *
  * Algorithm (Page et al. 1999, the damped power iteration):
  *   r_{t+1}(n) = (1-d)/N + d * ( Σ_{(m,n)∈E} r_t(m)/outdeg(m)
  *                                + dangling_t/N )
  * where dangling_t is the total rank parked on nodes with no
  * out-edges (their walk mass teleports uniformly — dropping it
  * would leak rank out of the system and the vector would no longer
  * sum to 1).
  *
  * Scale design (the 100 TB host graph):
  * - The edge list is the big side; it is hash-partitioned ONCE on
  *   `src` and localCheckpointed — every iteration's join re-uses
  *   that layout and shuffles only the O(nodes) rank vector.
  * - Each iteration is exactly two shuffles of O(nodes) rows (ranks
  *   into the edge join, contributions into `groupBy(dst)` — the
  *   aggregate map-side combines per partition) plus one O(1)
  *   scalar aggregate for the dangling mass. Nothing ever
  *   materializes O(edges) on the driver.
  * - Ranks are localCheckpointed per round: the plan references the
  *   previous vector twice (contribution join + dangling filter), so
  *   without lineage truncation the logical plan grows
  *   exponentially — the same failure mode [[Components]] documents.
  * - Multi-edges are honored as walk multiplicity (outdeg counts
  *   edge ROWS): a host linking twice sends twice the mass, the
  *   standard multigraph generalization. Callers wanting simple-graph
  *   semantics `.distinct()` their edge list first.
  *
  * Determinism: a FIXED iteration count (not a float tolerance) is
  * the public contract so the result is reproducible cross-engine —
  * the per-doc oracle unrolls the same three iterations in SQL.
  * `tol > 0` adds an optional early exit once the max per-node delta
  * falls below it (the production convergence mode, where exact
  * reproducibility across engines no longer matters).
  */
object PageRank {

  /** Input: directed edges with columns `src`, `dst` (long node
    * ids). Output: (`node`, `pagerank`) for every node appearing as
    * a source or destination; ranks sum to 1.
    *
    * @param damping    teleport damping factor d (classic 0.85)
    * @param iterations power-iteration rounds (fixed, for
    *                   reproducibility)
    * @param tol        optional early exit: stop once
    *                   max |r_{t+1}−r_t| < tol (0 = never)
    */
  def pageRank(edges: DataFrame, damping: Double = 0.85,
               iterations: Int = 3, tol: Double = 0.0): DataFrame = {
    require(iterations >= 1, "pageRank needs at least one iteration")
    require(damping > 0 && damping < 1, s"damping must be in (0,1): $damping")
    val spark = edges.sparkSession
    val shuffle = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // one-time layout: edges partitioned on src so every iteration's
    // rank join shuffles ranks only, never the (much larger) edges
    val e = edges.select(col("src"), col("dst"))
      .repartition(shuffle, col("src"))
      .localCheckpoint(true)
    val outdeg = e.groupBy("src").agg(count(lit(1)).cast("double").as("deg"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val nTotal = nodes.count().toDouble
    // nodes with no out-edges park their mass -> teleported each round
    val danglingNodes = nodes.join(outdeg, nodes("node") === outdeg("src"), "left_anti")
      .localCheckpoint(true)

    var ranks = nodes.withColumn("r", lit(1.0 / nTotal)).localCheckpoint(true)
    var iter = 0
    var done = false
    while (iter < iterations && !done) {
      // dangling mass rides as a broadcast 1-row aggregate, not a
      // driver-side action: each round is ONE job (the checkpoint),
      // and the driver never synchronously collects a scalar per
      // round — the same float ops either way, so the oracle's
      // unrolled SQL reproduces it bit-for-bit
      val dangling = danglingNodes.join(ranks, "node")
        .agg(coalesce(sum("r"), lit(0.0)).as("dm"))
      val contrib = e.join(outdeg, "src")
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("r") / col("deg")).as("contrib"))
      val next = nodes
        .join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (lit((1.0 - damping) / nTotal) +
            lit(damping) * (coalesce(col("contrib"), lit(0.0)) +
              col("dm") / nTotal)).as("r"))
        .localCheckpoint(true)
      if (tol > 0) {
        val delta = next.join(ranks.withColumnRenamed("r", "r0"), "node")
          .agg(max(abs(col("r") - col("r0")))).head().getDouble(0)
        done = delta < tol
      }
      org.apache.spark.sql.GraftBridge.unpersistCheckpoint(ranks)
      ranks = next
      iter += 1
    }
    org.apache.spark.sql.GraftBridge.unpersistCheckpoint(e)
    org.apache.spark.sql.GraftBridge.unpersistCheckpoint(outdeg)
    org.apache.spark.sql.GraftBridge.unpersistCheckpoint(danglingNodes)
    ranks.withColumnRenamed("r", "pagerank")
  }
}
