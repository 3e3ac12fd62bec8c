package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the version-audit operator of a managed
  * training corpus: given two keyed snapshots (yesterday's corpus
  * and today's), classify every key as `added`, `removed`,
  * `changed`, or `unchanged`. Every production corpus pipeline runs
  * this audit before promoting a new version (how many docs did the
  * recrawl actually touch? did a buggy scrubber silently rewrite
  * half the corpus?), and it is the verification half of
  * [[Merge.upsert]]: `diff(corpus, upsert(corpus, delta))` must
  * explain exactly the delta.
  *
  * Scale design: one full outer join on the key — each side shuffles
  * ONCE on the key it is (or should be) already bucketed by, so for
  * corpus tables written with `io.Sources.writeBucketed` the join is
  * exchange-free on both sides. Row content is compared via a single
  * 128-bit content hash computed BEFORE the join (a projection on
  * the scan), so the join carries (key, hash) — 24-ish bytes per
  * row — never the document payloads; at 100 TB the shuffle moves
  * ~0.1% of the table bytes. No window functions, no skew exposure
  * (keys are unique per side — the [[Merge.upsert]] uniqueness
  * contract).
  *
  * The content hash is `md5` over a SELF-DELIMITING encoding of the
  * compare columns: each value becomes `V<charlen>;<value>` and NULL
  * becomes `N;`, concatenated in column order. Length-prefixing makes
  * the encoding injective — no separator or sentinel character can be
  * forged by adversarial values (a separator-joined form collides on
  * values containing the separator, and a NULL sentinel collides with
  * the sentinel as a value; SnapshotSpec proves both). Deterministic,
  * engine-portable (ANSI SQL reproduces it verbatim), and
  * collision-bounded at 2⁻¹²⁸ (the trade already accepted for
  * exact-content dedup). Callers needing byte-exact compare on binary
  * columns pass a pre-computed hash column instead.
  */
object Snapshot {

  /** Corpus DRIFT report between two snapshot versions — the
    * distribution-shift monitor a managed corpus runs next to the
    * key-level diff: the diff says WHICH docs changed, this says how
    * much the LANGUAGE changed. One row:
    * (n_tokens_old, n_tokens_new, vocab_old, vocab_new, vocab_added,
    * vocab_removed, js_nats) where js_nats is the Jensen–Shannon
    * divergence between the two unigram distributions —
    * JS(P,Q) = ½KL(P‖M) + ½KL(Q‖M), M = (P+Q)/2, which (unlike raw
    * KL) is defined even where supports differ, so the whole number
    * is EXACT with no smoothing — hence fully oracle-able.
    * JS is bounded by ln 2; a recrawl that merely adds documents
    * from the same distribution scores near 0, a scraper bug that
    * swaps the language scores near the bound.
    *
    * Scale: each side collapses to (token, count) map-side-combined
    * (vocab-bounded, the 35ae/35af shape); ONE vocab-frame full
    * outer join; totals ride as broadcast 1-row aggregates; the
    * corpora are scanned once each and never joined row-to-row.
    */
  def driftReport(old: DataFrame, cur: DataFrame,
                  textCol: String): DataFrame =
    driftFromCounts(tokenCounts(old, textCol, "c1"),
      tokenCounts(cur, textCol, "c2"))

  /** Vocab-bounded unigram counts — the mergeable STATE of the drift
    * monitor: counts from two corpus slices (or accumulated stream
    * batches) fold by token-wise sum, so an incremental monitor
    * never re-scans history ([[graft.streaming.StreamingDrift]]).
    */
  def tokenCounts(df: DataFrame, textCol: String,
                  countName: String): DataFrame = df
    .select(explode(TextAnalysis.wsTokens(col(textCol))).as("tok"))
    .groupBy("tok").agg(count(lit(1)).as(countName))

  /** [[driftReport]] from pre-aggregated counts `a`(tok, c1) /
    * `b`(tok, c2).
    */
  def driftFromCounts(a: DataFrame, b: DataFrame): DataFrame = {
    val joined = a.join(b, Seq("tok"), "full_outer")
      .select(coalesce(col("c1"), lit(0L)).as("c1"),
        coalesce(col("c2"), lit(0L)).as("c2"))
    val tot = joined.agg(sum("c1").as("n1"), sum("c2").as("n2"))
    joined.crossJoin(broadcast(tot))
      .select(col("c1"), col("c2"), col("n1"), col("n2"),
        (col("c1").cast("double") / col("n1")).as("p"),
        (col("c2").cast("double") / col("n2")).as("q"))
      .withColumn("m", (col("p") + col("q")) / 2.0)
      .agg(
        first("n1").as("n_tokens_old"),
        first("n2").as("n_tokens_new"),
        count(when(col("c1") > 0, 1)).as("vocab_old"),
        count(when(col("c2") > 0, 1)).as("vocab_new"),
        count(when(col("c1") === 0, 1)).as("vocab_added"),
        count(when(col("c2") === 0, 1)).as("vocab_removed"),
        round(
          sum(when(col("p") > 0, col("p") * log(col("p") / col("m")) / 2.0)
            .otherwise(0.0)) +
          sum(when(col("q") > 0, col("q") * log(col("q") / col("m")) / 2.0)
            .otherwise(0.0)), 6).as("js_nats"))
  }

  /** Portable per-row content hash over `cols` (NULL-safe, order-
    * sensitive). Exposed so callers can persist it next to the data
    * and diff later snapshots against stored hashes without
    * re-reading payload columns at all.
    */
  def contentHash(cols: Seq[String]) =
    md5(concat(cols.map { c =>
      val v = col(c).cast("string")
      when(v.isNull, lit("N;"))
        .otherwise(concat(lit("V"), length(v), lit(";"), v))
    }: _*))

  /** Per-key diff of two snapshots. Output: (`key`, `status`) with
    * status in {added, removed, changed, unchanged} — `added` means
    * present only in `cur`, `removed` only in `old`, `changed` both
    * present with differing content hash.
    *
    * @param compareCols columns whose values define row identity for
    *                    the change test (the key itself need not be
    *                    listed); both snapshots must have them.
    */
  def diff(old: DataFrame, cur: DataFrame, key: String,
           compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "snapshot diff needs compare columns")
    // hash before the join: the shuffle carries (key, 128-bit hash),
    // never the payload columns
    val o = old.select(col(key), contentHash(compareCols).as("_oh"))
    val c = cur.select(col(key), contentHash(compareCols).as("_ch"))
    o.join(c, Seq(key), "full_outer")
      .select(col(key),
        when(col("_oh").isNull, "added")
          .when(col("_ch").isNull, "removed")
          .when(col("_oh") =!= col("_ch"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** The audit summary: row counts per status (one map-side-combined
    * aggregate over the diff — the number a promotion gate actually
    * reads).
    */
  def diffSummary(old: DataFrame, cur: DataFrame, key: String,
                  compareCols: Seq[String]): DataFrame =
    diff(old, cur, key, compareCols)
      .groupBy("status").agg(count(lit(1)).as("n"))

  // ---- SCD2 version history ----------------------------------------
  //
  // Corpus version HISTORY (type-2 slowly-changing dimension): every
  // key's lifetime is a set of (valid_from, valid_to) intervals, so
  // "the corpus as of version v" is a filter, and audits can ask when
  // a document changed and what it was before. The 100 TB design
  // decision: closed intervals are IMMUTABLE — state splits into the
  // OPEN set (current row of every live key, no valid_to column) and
  // an append-only CLOSED log that an apply step never reads, never
  // rewrites, and never shuffles. Applying a snapshot therefore costs
  // one hash-carrying join of open-vs-snapshot (both sides bucketed
  // by key in a managed layout ⇒ exchange-free, as with [[diff]])
  // plus payload-late key joins — history length never enters the
  // per-apply cost.

  /** Open-set bootstrap: every snapshot row becomes an open interval
    * starting at `version`. Schema: snapshot columns + `valid_from`.
    */
  def scd2Init(snapshot: DataFrame, version: Long): DataFrame =
    snapshot.withColumn("valid_from", lit(version))

  /** Apply snapshot `version` to the open set. Returns
    * (newOpen, newlyClosed):
    *  - keys whose content changed, and keys absent from the
    *    snapshot, leave the open set and appear in `newlyClosed`
    *    with `valid_to = version` (append these to the closed log);
    *  - changed and brand-new keys (re)enter the open set with
    *    `valid_from = version`;
    *  - unchanged keys keep their open row (and its older
    *    valid_from) untouched.
    *
    * Shuffle shape: the change test joins (key, 128-bit content
    * hash) projections — never payloads — and the payload joins are
    * key-only semi/anti joins against an O(changed keys) id set.
    * Snapshot keys must be unique (the [[Merge.upsert]] contract).
    */
  def scd2Apply(open: DataFrame, snapshot: DataFrame, key: String,
                compareCols: Seq[String],
                version: Long): (DataFrame, DataFrame) = {
    require(compareCols.nonEmpty, "scd2Apply needs compare columns")
    val oh = open.select(col(key), contentHash(compareCols).as("_oh"))
    val sh = snapshot.select(col(key), contentHash(compareCols).as("_sh"))
    val j = oh.join(sh, Seq(key), "full_outer")
    // leavers: changed content or removed key; entrants: changed or added
    val leavers = j.filter(col("_oh").isNotNull &&
      (col("_sh").isNull || col("_oh") =!= col("_sh"))).select(col(key))
    val entrants = j.filter(col("_sh").isNotNull &&
      (col("_oh").isNull || col("_oh") =!= col("_sh"))).select(col(key))
    val newlyClosed = open.join(leavers, Seq(key), "left_semi")
      .withColumn("valid_to", lit(version))
    val newOpen = open.join(leavers, Seq(key), "left_anti")
      .unionByName(scd2Init(snapshot.join(entrants, Seq(key), "left_semi"),
        version))
    (newOpen, newlyClosed)
  }

  /** The full history view: open intervals (valid_to = NULL) union
    * the closed log — the table "as of version v" queries filter with
    * `valid_from <= v AND (valid_to IS NULL OR valid_to > v)`.
    */
  def scd2History(open: DataFrame, closed: DataFrame): DataFrame =
    open.withColumn("valid_to", lit(null).cast("long")).unionByName(closed)
}
