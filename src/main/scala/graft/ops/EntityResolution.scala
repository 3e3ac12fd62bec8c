package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy entity resolution (record linkage): collapse noisy
  * duplicate records of the same real-world entity — case changes,
  * punctuation drift, typos — into one canonical entity id. The
  * classic Fellegi-Sunter pipeline, Spark-shaped:
  *
  *   1. BLOCK on a cheap normalization key (callers choose: digits
  *      only, soundex, sorted tokens …) — all-pairs comparison is
  *      quadratic in the corpus, blocked comparison is quadratic only
  *      within a block, and a good key keeps blocks O(1).
  *   2. MATCH within blocks by edit distance, with the triangle
  *      prefilter (|len a − len b| > maxDist ⇒ lev > maxDist) so the
  *      O(len²) Levenshtein runs only on survivors.
  *   3. CLUSTER matches transitively ([[Components]] — small-world
  *      chains like A~B~C merge even when lev(A,C) > maxDist).
  *
  * Scale: the block join shuffles on the block key; a degenerate key
  * (empty normalization) makes one quadratic block — callers own key
  * quality, and the length prefilter caps the per-pair cost. Edges
  * and components are O(matching pairs), the final mapping is one
  * id-keyed join. No driver-side state.
  */
object EntityResolution {

  /** (rec_id, name, entity_id) — the resolve join keeps the name
    * column so [[entities]] never re-scans the base table for it.
    */
  private def resolveFull(df: DataFrame, idCol: String, nameCol: String,
                          blockKey: Column, maxDist: Int): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    val recs = df.select(col(idCol).as("rec_id"), col(nameCol).as("name"),
      blockKey.as("blk"))
    val a = recs.select(col("blk"), col("rec_id").as("id_a"),
      col("name").as("name_a"))
    val b = recs.select(col("blk"), col("rec_id").as("id_b"),
      col("name").as("name_b"))
    val edges = a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .filter(levenshtein(col("name_a"), col("name_b")) <= maxDist)
      .select(col("id_a").as("a"), col("id_b").as("b"))
    val comp = Components.minLabelPropagate(edges)
    recs.join(comp, recs("rec_id") === comp("node"), "left")
      .select(col("rec_id"), col("name"),
        coalesce(col("component"), col("rec_id")).as("entity_id"))
  }

  /** Per-record entity assignment: (rec_id, entity_id) where
    * entity_id is the minimum record id of the transitively-matched
    * cluster; unmatched records are their own entity.
    */
  def resolve(df: DataFrame, idCol: String, nameCol: String,
              blockKey: Column, maxDist: Int): DataFrame =
    resolveFull(df, idCol, nameCol, blockKey, maxDist)
      .select("rec_id", "entity_id")

  /** Canonical entity table: one row per resolved entity with its
    * record count and the canonical (minimum-id member's) name —
    * survivor selection without member lists, via a min-struct
    * aggregate.
    */
  def entities(df: DataFrame, idCol: String, nameCol: String,
               blockKey: Column, maxDist: Int): DataFrame =
    resolveFull(df, idCol, nameCol, blockKey, maxDist)
      .groupBy("entity_id")
      .agg(count(lit(1)).as("n_records"),
        min(struct(col("rec_id"), col("name"))).as("m"))
      .select(col("entity_id"), col("n_records"),
        col("m.name").as("canonical_name"))
}
