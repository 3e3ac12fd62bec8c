package graft.ops

import graft.SparkSpec

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("kAnonymity flags small groups; summary computes the at-risk row share") {
    val df = Seq(
      ("en", "web"), ("en", "web"), ("en", "web"),   // n=3, safe at k=3
      ("en", "books"),                               // n=1, at risk
      ("de", "web"), ("de", "web"))                  // n=2, at risk at k=3
      .toDF("lang", "source")
    val detail = Privacy.kAnonymity(df, Seq("lang", "source"), 3)
      .orderBy("lang", "source")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(detail.toSeq === Seq(
      ("de", "web", 2L, true), ("en", "books", 1L, true), ("en", "web", 3L, false)))

    val s = Privacy.kAnonymitySummary(df, Seq("lang", "source"), 3).collect()(0)
    assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3)) === ((3L, 2L, 6L, 3L)))
    assert(s.getDouble(4) == 0.5)

    // k=2: only the singleton is at risk
    val s2 = Privacy.kAnonymitySummary(df, Seq("lang", "source"), 2).collect()(0)
    assert(s2.getLong(3) == 1L)
  }

  test("lDiversity flags homogeneous groups that k-anonymity passes") {
    val df = Seq(
      // big group, but every member shares one sensitive value
      ("en", "web"), ("en", "web"), ("en", "web"), ("en", "web"),
      // small group with diverse sensitive values
      ("de", "web"), ("de", "books"), ("de", "wiki"))
      .toDF("lang", "source")
    val rows = Privacy.lDiversity(df, Seq("lang"), "source", 2)
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.toSeq === Seq(
      ("de", 3L, 3L, false),   // 3 distinct sources: diverse
      ("en", 4L, 1L, true)))   // n=4 passes k=4 anonymity, fails 2-diversity
    // at l=4 even the diverse group is at risk
    val strict = Privacy.lDiversity(df, Seq("lang"), "source", 4)
      .collect().map(_.getBoolean(3))
    assert(strict.forall(identity))
  }

  test("tCloseness: TVD vs the global distribution, absent values included") {
    // global: 6x 4y -> p = (0.6, 0.4)
    // A: 3x 1y -> tvd 0.15; B: 1x 3y -> tvd 0.35;
    // C: 2x ONLY -> absent y contributes its full 0.4 -> tvd 0.4
    val df = Seq(
      ("A", "x"), ("A", "x"), ("A", "x"), ("A", "y"),
      ("B", "x"), ("B", "y"), ("B", "y"), ("B", "y"),
      ("C", "x"), ("C", "x"))
      .toDF("g", "source")
    val rows = Privacy.tCloseness(df, Seq("g"), "source", t = 0.3)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.toSeq === Seq(
      ("A", 4L, 0.15, false), ("B", 4L, 0.35, true), ("C", 2L, 0.4, true)))

    // a group distributed exactly like the corpus scores 0
    val uniform = Seq(("A", "x"), ("A", "y"), ("B", "x"), ("B", "y"))
      .toDF("g", "source")
    val z = Privacy.tCloseness(uniform, Seq("g"), "source", t = 0.1)
      .collect().map(_.getDouble(2))
    assert(z.forall(_ == 0.0))
  }
}
