package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components — the group-resolution step after
  * near-duplicate pair generation (pairs say "a ~ b"; training-data
  * dedup needs the transitive GROUPS so one survivor per group can be
  * kept). Also the classic iterative-converging-joins workload.
  *
  * Algorithm: min-label propagation with pointer jumping. Each
  * iteration
  *   1. propagates labels across edges (both directions), and
  *   2. short-circuits label chains by joining labels with itself
  *      (lbl(node) := lbl(lbl(node))),
  * then keeps the minimum. Convergence is O(eccentricity of each
  * component's min): the jump compresses label chains (a measured 2x
  * on paths) but information still crosses each edge once, so an
  * adversarial L-long chain costs ~L/2 rounds. That bound is the
  * right trade for the dedup workload: near-duplicate groups are
  * stars/cliques of diameter ≤ ~2, which converge in 3 rounds
  * regardless of group size. (Sub-logarithmic worst-case variants —
  * large-star/small-star contraction — exist but complicate every
  * round for a topology dedup never produces.)
  *
  * Convergence is detected by carrying each node's previous label
  * through the propagation aggregate (`old`), so the check is a
  * filter over the just-checkpointed blocks — no extra join, and the
  * only per-round jobs are the checkpoint itself plus that cheap
  * scan. `maxIter` bounds the work for adversarial graphs; hitting
  * it without converging THROWS (partially-propagated labels would
  * silently split dedup survivor groups downstream — wrong rows
  * would be deleted).
  */
object Components {

  /** Input: an edge list with columns `a`, `b` (undirected, node ids
    * as longs). Output: (`node`, `component`) where component is the
    * minimum node id reachable from `node`.
    *
    * @throws IllegalStateException if labels have not converged after
    *   `maxIter` rounds (graph eccentricity > ~2·maxIter) — raise
    *   `maxIter` for long-chain graphs rather than consuming wrong
    *   labels.
    */
  def minLabelPropagate(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // localCheckpoint (not persist): each iteration's plan references
    // the previous one THREE times, so without lineage TRUNCATION the
    // logical plan grows 3^iter nodes and the driver dies planning
    // iteration ~10. Checkpointing materializes the labels and cuts
    // the plan back to a leaf every round.
    val sym = edges.select(col("a"), col("b"))
      .unionAll(edges.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint(true)
    // seed with the first neighbor propagation for free: lbl(node) =
    // min(node, min neighbor) is one aggregate over the edges — the
    // same rows round 1 would otherwise spend a join producing, so
    // star/clique dedup groups converge one checkpointed round
    // earlier (node enumeration needs a groupBy anyway, so this
    // costs nothing extra)
    var labels = sym.groupBy(col("a").as("node"))
      .agg(min(least(col("a"), col("b"))).as("lbl"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // neighbor propagation: b gets a's label (no previous label —
      // the null `old` vanishes under min(); every node's own labels
      // row supplies the real one)
      val viaEdges = sym.join(labels, sym("a") === labels("node"))
        .select(sym("b").as("node"), col("lbl"), lit(null).cast("long").as("old"))
      // pointer jumping: node -> lbl -> lbl(lbl)
      val l2 = labels.select(col("node").as("n2"), col("lbl").as("l2"))
      val viaJump = labels.join(l2, labels("lbl") === l2("n2"))
        .select(labels("node"), col("l2").as("lbl"), lit(null).cast("long").as("old"))
      val next = labels.select(col("node"), col("lbl"), col("lbl").as("old"))
        .unionAll(viaEdges).unionAll(viaJump)
        .groupBy("node").agg(min("lbl").as("lbl"), min("old").as("old"))
        .localCheckpoint(true)
      // convergence: previous label rode along through the aggregate,
      // so this is a filter over the in-memory checkpoint blocks —
      // not the former label⋈label join job
      val changed = next.filter(col("lbl") =!= col("old")).limit(1).count()
      // Dataset.unpersist is a no-op for checkpoint blocks — free the
      // superseded snapshot's backing RDD explicitly
      org.apache.spark.sql.GraftBridge.unpersistCheckpoint(labels)
      labels = next.select("node", "lbl")
      converged = changed == 0L
      iter += 1
    }
    org.apache.spark.sql.GraftBridge.unpersistCheckpoint(sym)
    if (!converged)
      throw new IllegalStateException(
        s"Components.minLabelPropagate did not converge within maxIter=$maxIter rounds " +
        "(graph eccentricity exceeds ~2*maxIter); labels would be partially propagated " +
        "and downstream dedup would delete wrong rows — raise maxIter for this graph")
    labels.withColumnRenamed("lbl", "component")
  }

  /** Incremental connected components: fold a DELTA edge batch into
    * an existing (`node`, `component`) labeling without touching the
    * historical edge list — the daily-ingest companion to
    * `Dedup.dedupIncrementAgainstIndex` (each day's near-dup pairs
    * must update survivor groups, and re-running CC over months of
    * accumulated pairs would scan 100 TB of history for a 0.1%
    * delta).
    *
    * The trick is graph CONTRACTION: map each delta endpoint to its
    * current component id (itself if unseen), and run the iterative
    * propagation only on that contracted graph — whose size is
    * O(delta), not O(corpus). Because every component id is the MIN
    * node id of its members (the `minLabelPropagate` invariant), the
    * contracted run's output is directly the old-root -> new-root
    * relabeling, and the big labeling absorbs it with ONE broadcast
    * join (the relabel map is O(components touched by the delta) —
    * tiny). History is never re-paired, re-shuffled, or re-iterated.
    *
    * Output invariant matches `minLabelPropagate`: component = min
    * node id reachable in the UNION of the historical and delta
    * edges (spec'd ≡ a from-scratch run on the union).
    */
  def incrementalComponents(labels: DataFrame, deltaEdges: DataFrame,
                            maxIter: Int = 20): DataFrame = {
    val la = labels.select(col("node").as("a"), col("component").as("ca"))
    val lb = labels.select(col("node").as("b"), col("component").as("cb"))
    // contract: endpoints become their current component (unseen
    // nodes stay themselves — they ARE their own component so far).
    // localCheckpoint BEFORE the emptiness gate: the contraction
    // joins against the (100 TB) labeling, and without
    // materialization that join pipeline would execute TWICE — once
    // for the gate, once for the propagation (the Merge.upsert gate
    // pattern). The materialized rows are O(delta).
    val contracted = deltaEdges.select(col("a"), col("b"))
      .join(la, Seq("a"), "left").join(lb, Seq("b"), "left")
      .select(coalesce(col("ca"), col("a")).as("a"),
        coalesce(col("cb"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
      .localCheckpoint(true)
    // unseen delta endpoints must enter the labeling even when every
    // delta edge contracts away (self-loops / edges inside one
    // existing component): a lone new node is its own component
    val known = labels.select(col("node"))
    def unseen(withRoots: Option[DataFrame]): DataFrame = {
      val fresh = deltaEdges.select(col("a").as("node"))
        .union(deltaEdges.select(col("b").as("node"))).distinct()
        .join(known, Seq("node"), "left_anti")
      withRoots match {
        case Some(moved) => fresh
          .join(broadcast(moved), col("node") === moved("old_root"), "left")
          .select(col("node"), coalesce(col("new_root"), col("node")).as("component"))
        case None => fresh.select(col("node"), col("node").as("component"))
      }
    }
    if (contracted.isEmpty) return labels.unionByName(unseen(None))
    // CC over the contracted graph: O(delta)-sized, so the iteration
    // cost is decoupled from corpus size
    val moved = minLabelPropagate(contracted, maxIter)
      .withColumnRenamed("node", "old_root")
      .withColumnRenamed("component", "new_root")
    // relabel map is tiny (≤ 2·|delta| roots) -> broadcast join; the
    // corpus-sized labeling is scanned once, never shuffled
    val relabeled = labels
      .join(broadcast(moved), labels("component") === moved("old_root"), "left")
      .select(col("node"),
        coalesce(col("new_root"), col("component")).as("component"))
    // brand-new nodes (delta endpoints absent from the labeling)
    // enter with their contracted root
    relabeled.unionByName(unseen(Some(moved)))
  }
}
