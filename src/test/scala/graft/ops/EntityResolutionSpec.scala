package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  // A transitive CHAIN: 1~2 (lev 2) and 2~3 (lev 2) but lev(1,3) = 3
  // > maxDist — pairwise matching alone would split the entity; the
  // component step must merge it. 4 shares the block but is far from
  // everything; 5 is alone in its own block.
  private val recs = Seq(
    (1L, "aaaaa"), (2L, "aaabb"), (3L, "aabbb"),
    (4L, "xyxyx"),
    (5L, "zzz"))
    .toDF("id", "name")

  test("resolve merges transitive chains and isolates non-matches") {
    val got = EntityResolution.resolve(recs, "id", "name",
        length(col("name")), maxDist = 2)
      .orderBy("rec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), // chain merged despite lev(1,3)=3
      (4L, 4L), (5L, 5L)))
  }

  test("entities: canonical survivor is the minimum-id member") {
    val got = EntityResolution.entities(recs, "id", "name",
        length(col("name")), maxDist = 2)
      .orderBy("entity_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq === Seq(
      (1L, 3L, "aaaaa"), (4L, 1L, "xyxyx"), (5L, 1L, "zzz")))
  }

  test("blocking is load-bearing: same names in different blocks never match") {
    val df = Seq((1L, "same"), (2L, "same")).toDF("id", "name")
    val split = EntityResolution.resolve(df, "id", "name",
        col("id") % 2, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(split === Set((1L, 1L), (2L, 2L)))
  }
}
