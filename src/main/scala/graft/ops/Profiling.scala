package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Column-level data profiling: one row per profiled column with
  * row/null/distinct counts and min/max (rendered as strings so one
  * schema covers every column type).
  *
  * ONE scan computes everything. Each row is unpivoted into
  * (column-index, typed-ordering value, canonical string value) via
  * `stack`, then a two-level aggregate — `groupBy(i, str, num)` with
  * a per-value count, then `groupBy(i)` — yields rows, nulls, exact
  * distincts and min/max per column in a single job. The first level
  * partial-combines map-side to one row per DISTINCT value per
  * column, so the shuffle carries each column's value dictionary,
  * not the scan; the second level is a few rows. The previous form
  * ran one base-stats job plus one groupBy-distinct job PER COLUMN
  * (N+1 jobs — dominated by fixed job overhead on anything but a
  * giant table), and the textbook alternative, N `count(DISTINCT)`s
  * in one aggregate, makes Catalyst plan an Expand that multiplies
  * every scan row by N+1 before the shuffle (measured 80x the
  * single-pass cost on a 3-column profile).
  *
  * Distinctness is counted on the canonical STRING rendering
  * (injective for every Spark type — doubles render
  * shortest-roundtrip), while ordering for numeric min/max uses the
  * double cast (monotone, and ties render identically). Numeric
  * min/max are rendered with an explicit fixed format (`%.6f`)
  * because each engine's native double-to-string formatter diverges
  * at magnitude ≥ 1e7 (scientific vs positional) — the explicit
  * format is the engine-stable contract the oracle mirrors with
  * printf.
  *
  * `exact = false` keeps the same single job but swaps the two-level
  * distinct for HyperLogLog estimates (±2%) inside a plain
  * aggregate — the right trade for a wide profile over
  * high-cardinality columns where even the value dictionaries are
  * too big to shuffle.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty)
    def isNum(c: String) = df.schema(c).dataType.isInstanceOf[NumericType]
    def renderNum(x: Column) = format_string("%.6f", x)
    if (!exact) {
      val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
        val r = if (isNum(c)) (x: Column) => renderNum(x.cast("double"))
                else (x: Column) => x.cast("string")
        Seq(count(col(c)).as(s"nn_$i"),
          r(min(col(c))).as(s"mn_$i"),
          r(max(col(c))).as(s"mx_$i"),
          approx_count_distinct(col(c), 0.02).as(s"nd_$i"))
      }
      val base = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
      val stackArgs = cols.zipWithIndex.map { case (c, i) =>
        s"'${c.replace("'", "''")}', n_rows - nn_$i, nd_$i, mn_$i, mx_$i"
      }.mkString(", ")
      return base.select(col("n_rows"),
        expr(s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_val, max_val)"))
        .select(col("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }
    // exact: unpivot to (i, num, str) and aggregate twice in one job
    val unpivoted = df.select(posexplode(array(cols.map { c =>
      struct(
        (if (isNum(c)) col(c).cast("double") else lit(null).cast("double")).as("num"),
        col(c).cast("string").as("str"))
    }: _*)).as(Seq("i", "v")))
      .select(col("i"), col("v.num").as("num"), col("v.str").as("str"))
    val perCol = unpivoted
      .groupBy("i", "str", "num").agg(count(lit(1)).as("c"))
      .groupBy("i").agg(
        sum("c").as("n_rows"),
        sum(when(col("str").isNull, col("c")).otherwise(lit(0L))).as("n_nulls"),
        count(when(col("str").isNotNull, lit(1))).as("n_distinct"),
        min("num").as("mn_num"), max("num").as("mx_num"),
        min("str").as("mn_str"), max("str").as("mx_str"))
    val nameOf = cols.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, (c, i)) => when(col("i") === i, lit(c)).otherwise(acc)
    }
    def rendered(mnNum: Column, mnStr: Column) =
      cols.zipWithIndex.foldLeft(lit(null).cast("string")) {
        case (acc, (c, i)) =>
          when(col("i") === i,
            if (isNum(c)) renderNum(mnNum) else mnStr).otherwise(acc)
      }
    perCol.select(
      nameOf.as("col_name"), col("n_rows"), col("n_nulls"), col("n_distinct"),
      rendered(col("mn_num"), col("mn_str")).as("min_val"),
      rendered(col("mx_num"), col("mx_str")).as("max_val"))
  }

  /** Empirical-Bayes shrunk per-group means: the ranking a pipeline
    * should use when groups have wildly different sizes (per-domain
    * quality, per-source score). The raw mean of a 3-document source
    * is noise; ranking by it promotes flukes. Shrink each group mean
    * toward the global mean with prior strength `tau` pseudo-counts
    * (the normal-normal posterior mean, Efron & Morris 1975):
    * shrunk = (n·mean + tau·global) / (n + tau). Small groups collapse
    * to the prior; big groups keep their evidence.
    *
    * One map-side-combined aggregate to per-group (n, sum); the
    * global mean comes from a global window over those GROUP rows —
    * a single partition of metadata-sized cardinality (that is what
    * makes a column a grouping key). An agg-then-rejoin would re-run
    * the corpus aggregate per plan branch; this scans the corpus
    * exactly once.
    */
  def ebShrunkMeans(df: DataFrame, groupCol: String, valueCol: String,
                    tau: Double): DataFrame = {
    require(tau > 0, "prior strength must be positive")
    import org.apache.spark.sql.expressions.Window
    df.groupBy(col(groupCol))
      .agg(count(col(valueCol)).as("n"), sum(col(valueCol)).as("s"))
      .withColumn("global_mean",
        sum("s").over(Window.partitionBy()) /
          sum("n").over(Window.partitionBy()))
      .select(col(groupCol), col("n"),
        round(col("s") / col("n"), 6).as("raw_mean"),
        round((col("s") + lit(tau) * col("global_mean")) /
          (col("n") + lit(tau)), 6).as("shrunk_mean"),
        round(col("global_mean"), 6).as("global_mean"))
  }

  /** Portable HyperLogLog (Flajolet et al. 2007) — a distinct-count
    * sketch whose ANSWER is cross-engine deterministic, unlike
    * `approx_count_distinct` (Spark-internal xxhash + HLL++ bias
    * tables, unreproducible elsewhere). Built from engine-portable
    * pieces: md5 key hash (60 bits via 15 hex digits — never pushed
    * through a double), bucket = h mod m, rho = leading-zero rank of
    * the remaining 52-bit word, and the harmonic sum Σ2^−Mⱼ kept as
    * the EXACT integer Σ2^(53−Mⱼ) (every term ≤ 2^53, m terms fit a
    * long) so partial sums are order-independent and the estimate is
    * the same IEEE double on any engine/partitioning — the CountMin
    * trick applied to HLL. Standard small-range correction
    * (E ≤ 2.5m with empty buckets → m·ln(m/V)).
    *
    * State: O(groups × m) register rows, two cascaded map-side
    * combined aggregates — the bounded-state per-group cardinality
    * answer when exact two-level distinct counting (23o) would
    * shuffle each group's full value dictionary.
    */
  /** The standard HLL bias constant: exact small-m values, the
    * closed form above m = 64 (Flajolet et al. 2007, Fig. 3).
    */
  def hllAlpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** The HLL register table (g, bucket, mr) for a keyed frame — the
    * sketch's DISTRIBUTED representation. Registers are a max-monoid:
    * the registers of a union of samples are the bucketwise max of
    * their registers, so per-shard/per-day register tables merge into
    * any coarser grouping without touching the raw keys again
    * ([[hllEstimateFromRegisters]] finishes any such merge).
    */
  def hllRegisters(df: DataFrame, groupCol: String, keyCol: String,
                   b: Int = 8): DataFrame = {
    require(b >= 4 && b <= 16, s"bucket bits in [4,16], got $b")
    val m = 1 << b
    val wBits = 60 - b          // word bits left of the 60-bit md5 hash
    val zeroRank = wBits + 1    // rho of an all-zeros word
    val h = conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    df.select(col(groupCol).as("g"), h.as("h"))
      .withColumn("bucket", pmod(col("h"), lit(m.toLong)))
      .withColumn("w", expr(s"h div $m"))
      // rho = leading zeros of the wBits word + 1 = wBits - floor(log2 w)
      // (bit_length L ⇒ wBits−L zeros, +1); w = 0 ⇒ rank wBits+1
      .withColumn("rho", when(col("w") === 0, lit(zeroRank))
        .otherwise(lit(wBits) - floor(log2(col("w"))).cast("int")))
      .groupBy("g", "bucket").agg(max("rho").as("mr"))
  }

  /** Finish a register table into per-group estimates (g, hll_est).
    * Re-aggregates by (g, bucket) first, so callers may feed RAW
    * concatenations of register tables (relabeled groups, unioned
    * shards) — the bucketwise-max merge happens here.
    */
  def hllEstimateFromRegisters(regs: DataFrame, b: Int = 8): DataFrame = {
    val m = 1 << b
    val wBits = 60 - b
    val zeroRank = wBits + 1
    val scale = 1L << zeroRank  // Σ2^−M kept exact as Σ2^(zeroRank−M)
    val alpha = hllAlpha(m)
    regs.groupBy("g", "bucket").agg(max("mr").as("mr"))
      .groupBy("g").agg(
        sum(pow(lit(2.0), lit(zeroRank) - col("mr")).cast("long"))
          .as("s_present"),
        count(lit(1)).as("n_buckets"))
      .select(col("g"),
        // empty buckets carry M=0, i.e. 2^zeroRank each
        (col("s_present") +
          (lit(m.toLong) - col("n_buckets")) * lit(scale)).as("s"),
        (lit(m.toLong) - col("n_buckets")).as("v"))
      .withColumn("e_raw",
        lit(alpha * m.toDouble * m.toDouble * scale.toDouble) /
          col("s").cast("double"))
      .withColumn("hll_est", round(
        when(col("e_raw") <= 2.5 * m && col("v") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("v")))
          .otherwise(col("e_raw")), 2))
      .select(col("g"), col("hll_est"))
  }

  /** Per-group distinct estimates straight from a keyed frame:
    * [[hllRegisters]] finished by [[hllEstimateFromRegisters]],
    * relabeled to the caller's group column.
    */
  def hllDistinctByGroup(df: DataFrame, groupCol: String, keyCol: String,
                         b: Int = 8): DataFrame =
    hllEstimateFromRegisters(hllRegisters(df, groupCol, keyCol, b), b)
      .withColumnRenamed("g", groupCol)

  /** Incremental maintenance of a persisted register table — the
    * distinct-count member of the [[Merge.maintainGroupStats]]
    * lifecycle: fold a delta's registers in by bucketwise MAX
    * (registers are a max-monoid), cost O(groups · 2^b), the raw
    * keys never revisited. Maintained registers are EXACTLY the full
    * recompute's, so the finished estimate is too. Deletions are not
    * supported (max has no inverse) — the standard HLL limitation.
    *
    * REBUILD CADENCE for corpora with deletes: registers only ever
    * OVER-count after a retraction (a deleted key may still hold a
    * register max), so the maintained estimate is an upper bound
    * whose error grows with the deleted share. Schedule a per-group
    * rebuild (re-run [[hllRegisters]] over the surviving rows) when
    * `deleted_n / n` for the group passes the sketch's own error
    * (~1.04/√2^b ≈ 6.5% at b = 8) — below that, deletion skew is
    * indistinguishable from sketch noise. Track `deleted_n` in the
    * (n, …) stats table maintained alongside
    * ([[Merge.maintainGroupStats]] folds negative deltas), so the
    * trigger needs no extra scan; rebuilds touch ONLY the groups past
    * the threshold, never the whole corpus. Contrast
    * [[QuantileSketch.mergeSketches]], whose counts form a group and
    * retract EXACTLY — when deletes dominate a workload, prefer
    * count-based sketches and keep HLL for the append-mostly tables.
    */
  def maintainHllRegisters(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta)
      .groupBy("g", "bucket").agg(max("mr").as("mr"))

  /** Per-group closed-form OLS of y on x: (group, n, slope,
    * intercept, r2) — thousands of tiny regressions (per-source
    * quality-vs-length trends, per-user engagement slopes) in ONE
    * map-side-combined aggregate over one scan; no per-group
    * iteration, no driver loops. 4dp rounding absorbs the
    * summation-order ULP (the q_corr_stats precedent). Groups with
    * constant x return null slope (det = 0) in any engine.
    */
  def groupOls(df: DataFrame, groupCol: String, xCol: String,
               yCol: String): DataFrame = {
    val x = col(xCol)
    val y = col(yCol)
    val np = count(lit(1)).cast("double")
    val det = np * sum(x * x) - sum(x) * sum(x)
    val cov = np * sum(x * y) - sum(x) * sum(y)
    val varY = np * sum(y * y) - sum(y) * sum(y)
    // explicit zero guards, not bare division: ANSI Spark THROWS on
    // /0 (killing the whole job for one degenerate group) while
    // DuckDB returns inf — null is the portable "no fit" answer
    val slope = when(det =!= 0.0, cov / det)
    df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      round(slope, 4).as("slope"),
      round((sum(y) - slope * sum(x)) / np, 4).as("intercept"),
      round(when(det * varY =!= 0.0, cov * cov / (det * varY)), 4).as("r2"))
  }

  /** Benford's-law first-digit audit (Benford 1938; Nigrini 1996 —
    * the standard fabricated-data / broken-ETL screen for naturally
    * occurring amounts): per first significant digit d, the observed
    * share vs the Benford expectation log10(1 + 1/d), with the
    * deviation. One map-side-combined aggregate to 9 rows.
    *
    * The first digit is extracted from the INTEGER string rendering
    * of the value scaled to cents — never from the double's own
    * rendering (engines format doubles differently) and never via
    * floor(log10(x)) (libm log10(1000) can read 2.999…96 and shift
    * the digit) — integers render identically everywhere, which is
    * what makes the audit oracle-able.
    */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = round(col(valueCol) * 100).cast("long")
    val digit = substring(abs(cents).cast("string"), 1, 1).cast("int")
    df.filter(col(valueCol) =!= 0)
      .select(digit.as("digit"))
      .filter(col("digit") >= 1)
      .groupBy("digit").agg(count(lit(1)).as("n"))
      .withColumn("n_total", sum("n").over(Window.partitionBy()))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("n_total"), 6).as("observed_p"),
        round(log10(lit(1.0) + lit(1.0) / col("digit")), 6).as("expected_p"),
        round(col("n").cast("double") / col("n_total") -
          log10(lit(1.0) + lit(1.0) / col("digit")), 6).as("dev"))
  }

  /** Pearson chi-square test of independence between two categorical
    * columns — the corpus-audit question "is language mix independent
    * of source?" (a strong dependence means per-source filtering will
    * silently reweight languages). Returns one row:
    * (chi2, dof, n, cramers_v). Cramér's V = sqrt(chi2 / (n·min(r−1,
    * c−1))) gives the size-free effect strength.
    *
    * One aggregate over the scan to the observed contingency cells;
    * everything else happens on those metadata-sized cells. Missing
    * (r,c) combinations still contribute to the statistic — each
    * empty cell adds its expected count e — but no r×c grid is ever
    * materialized: algebraically Σ_all (o−e)²/e = Σ_obs o²/e − N
    * (expand the square; Σ_all o = Σ_all e = N and o = 0 off the
    * observed support), so the statistic needs only the observed
    * cells with their margins, which two windows over the cell frame
    * provide in the same job. The corpus is scanned exactly once.
    */
  def chiSquareIndependence(df: DataFrame, rowCol: String,
                            colCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df.groupBy(col(rowCol).as("r"), col(colCol).as("c"))
      .agg(count(lit(1)).as("o"))
      .withColumn("row_n", sum("o").over(Window.partitionBy("r")))
      .withColumn("col_n", sum("o").over(Window.partitionBy("c")))
      .withColumn("nn", sum("o").over(Window.partitionBy()))
    // o²/e = o²·N/(row_n·col_n); cast before multiplying — the margin
    // product overflows BIGINT long before doubles lose the statistic.
    val chi2 = sum(col("o").cast("double") * col("o") * col("nn") /
      (col("row_n").cast("double") * col("col_n"))) - first("nn")
    cells.agg(
      round(chi2, 6).as("chi2"),
      ((count_distinct(col("r")) - 1) *
        (count_distinct(col("c")) - 1)).as("dof"),
      first("nn").as("n"),
      round(sqrt(chi2 / (first("nn") *
        least(count_distinct(col("r")) - 1,
          count_distinct(col("c")) - 1))), 6).as("cramers_v"))
  }
}
