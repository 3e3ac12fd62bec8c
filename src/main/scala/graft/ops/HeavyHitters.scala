package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact heavy hitters over an unbounded vocabulary via a
  * Misra–Gries candidate pass plus an exact recount — the standard
  * sketch-then-verify shape (Cormode & Hadjieleftheriou 2008,
  * "Finding frequent items in data streams", §4).
  *
  * Why not one `groupBy(token).count()`? That shuffles one row per
  * DISTINCT token; on open web text the vocabulary grows with the
  * corpus (urls, ids, typos), so the shuffle — and the skew on it —
  * is unbounded. Here:
  *
  *   pass 1: `MisraGries(k)` + `count(*)` in ONE partial-aggregating
  *           scan → ≤ k candidate tokens and the exact stream length
  *           N. Shuffle: O(partitions × k) sketch bytes. Guarantee:
  *           every token with frequency ≥ s·N survives when
  *           k ≥ ⌈1/s⌉ (MG keeps anything > N/(k+1)).
  *   pass 2: recount ONLY the candidates — `isin` filter (broadcast
  *           literal, codegen'd) then a ≤ k-key map-side-combined
  *           aggregate. Shuffle: O(partitions × k) rows.
  *
  * Result is EXACT (no false negatives by the guarantee, no false
  * positives after the recount's threshold filter) and therefore
  * oracled cross-engine, unlike a sketch-only answer.
  */
object HeavyHitters {

  /** Tokens with exact frequency ≥ `support` × N, with exact counts:
    * `(token, n)`, n descending, token ascending. `k` defaults to
    * 2·⌈1/support⌉ — double the guarantee minimum so recount lists
    * stay short without risking misses.
    */
  def frequentTokens(df: DataFrame, tokenCol: String, support: Double,
                     kOverride: Option[Int] = None): DataFrame = {
    require(support > 0 && support <= 1, s"support in (0,1], got $support")
    val k = kOverride.getOrElse(2 * math.ceil(1.0 / support).toInt)
    require(k + 1 > 1.0 / support,
      s"k=$k cannot guarantee support=$support (needs k+1 > 1/support)")
    val sketchRow = df
      .agg(graft.functions.Native.misraGries(col(tokenCol), k).as("cand"),
        count(col(tokenCol)).as("n_total"))
      .collect()(0)
    val nTotal = sketchRow.getLong(1)
    val minN = math.ceil(support * nTotal).toLong
    val cands = sketchRow.getSeq[org.apache.spark.sql.Row](0)
      .map(_.getString(0))
    if (cands.isEmpty) {
      // derive the empty frame from the SAME plan shape as the
      // non-empty branch so column types/nullability match exactly —
      // a literal-built schema (non-null token) breaks a downstream
      // unionByName with the other branch
      df.groupBy(col(tokenCol).as("token"))
        .agg(count(lit(1)).as("n")).limit(0)
    } else {
      df.filter(col(tokenCol).isin(cands: _*))
        .groupBy(col(tokenCol).as("token"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= minN)
        .orderBy(col("n").desc, col("token"))
    }
  }

  // ---- Count-Min sketch -----------------------------------------------

  /** Default CMS geometry, shared verbatim with the oracle SQL:
    * ε = e/1024 ≈ 0.27% of N overcount at 1 − e⁻⁴ ≈ 98% per query.
    */
  val CmsWidth = 1024
  val CmsDepth = 4
  val CmsSeeds: Seq[(Long, Long)] =
    Seq((1000003L, 17L), (999983L, 29L), (823117L, 41L), (617011L, 59L))
  val CmsP = 1000000007L

  /** The bucket index of `hash` in CMS row `i`: (((h mod P)·aᵢ + bᵢ)
    * mod P) mod width — pure integer arithmetic, identical in any
    * engine. `hash` MUST be reduced mod P before the multiply, exactly
    * as [[graft.functions.Native.CountMinLongs]]'s update does: a
    * full-range 64-bit pre-hashed key times aᵢ overflows Long, so an
    * unreduced product would read different buckets than the sketch
    * wrote (undercounting — a violated CMS guarantee — and an ANSI-mode
    * error). pmod vs the kernel's signed `% P` is immaterial: the two
    * residues are congruent mod P, and only the congruence class
    * survives the outer mod. Reduced, the product stays < ~1e15.
    */
  def cmsBucket(hash: Column, i: Int, width: Int = CmsWidth,
                seeds: Seq[(Long, Long)] = CmsSeeds): Column =
    pmod(pmod(pmod(hash, lit(CmsP)) * seeds(i)._1 + seeds(i)._2,
      lit(CmsP)), lit(width))

  /** One-row Count-Min sketch of a pre-hashed key column: a single
    * array<long> of depth·width counters. O(depth·width) state per
    * map task, merged by exact elementwise add — the sketch is
    * bit-identical on any partitioning.
    */
  def cmsSketch(df: DataFrame, hashCol: String, width: Int = CmsWidth,
                depth: Int = CmsDepth,
                seeds: Seq[(Long, Long)] = CmsSeeds): DataFrame =
    df.agg(graft.functions.Native.countMin(col(hashCol), width, depth, seeds)
      .as("sketch"))

  /** Point estimate from a sketch array column: min over the depth
    * buckets of `hash`. Never undercounts; over by ≤ εN w.h.p.
    */
  def cmsEstimate(sketch: Column, hash: Column, width: Int = CmsWidth,
                  depth: Int = CmsDepth,
                  seeds: Seq[(Long, Long)] = CmsSeeds): Column =
    least((0 until depth).map { i =>
      element_at(sketch, (lit(i * width) + cmsBucket(hash, i, width, seeds)
        + 1).cast("int"))
    }: _*)
}
