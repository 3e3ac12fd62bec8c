package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrigramIndexSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox"),
    (2L, "quicksilver surfer"),
    (3L, "a slow brown dog"),
    // all trigrams of "abcdef" scattered (abcd + cdef) WITHOUT the
    // substring itself — the candidate filter alone would return it
    (4L, "abcdxx then xcdefx"),
    (5L, "abcdef verbatim"))
    .toDF("doc_id", "text")

  private lazy val built: Unit =
    TrigramIndex.buildTrigramIndex(corpus, "doc_id", "text",
      "graft_test_trgm", buckets = 8)

  test("substringSearch ≡ brute-force contains; verify kills gram-scattered candidates") {
    built
    def search(p: String) =
      TrigramIndex.substringSearch(spark, "graft_test_trgm", p)
        .collect().map(_.getLong(0)).toSet
    def brute(p: String) =
      corpus.filter(col("text").contains(p))
        .collect().map(_.getLong(0)).toSet
    for (p <- Seq("quick", "brown", "ck b", "abcdef", "zzz", "n fox"))
      assert(search(p) === brute(p), s"pattern '$p'")
    // the gram-scattered doc 4 was a CANDIDATE for abcdef but not a hit
    assert(search("abcdef") === Set(5L))
  }

  test("append ≡ rebuild; compaction changes nothing but file counts") {
    val part = corpus.filter(col("doc_id") <= 3)
    val rest = corpus.filter(col("doc_id") > 3)
    TrigramIndex.buildTrigramIndex(part, "doc_id", "text",
      "graft_test_trgm_inc", buckets = 8)
    TrigramIndex.appendToTrigramIndex(spark, "graft_test_trgm_inc",
      rest, "doc_id", "text")
    def results(name: String, p: String) =
      TrigramIndex.substringSearch(spark, name, p)
        .collect().map(_.getLong(0)).toSet
    TrigramIndex.buildTrigramIndex(corpus, "doc_id", "text",
      "graft_test_trgm_full", buckets = 8)
    for (p <- Seq("quick", "abcdef", "brown"))
      assert(results("graft_test_trgm_inc", p) ===
        results("graft_test_trgm_full", p), s"pattern '$p'")

    val before = results("graft_test_trgm_inc", "quick")
    TrigramIndex.compactTrigramIndex(spark, "graft_test_trgm_inc")
    assert(results("graft_test_trgm_inc", "quick") === before)
  }

  test("short patterns error loudly instead of silently missing") {
    built
    val e = intercept[IllegalArgumentException] {
      TrigramIndex.substringSearch(spark, "graft_test_trgm", "ab")
    }
    assert(e.getMessage.contains("scan the corpus"))
  }

  test("postings probe bucket-prunes; verify pushes id + contains to the scan") {
    built
    // the probe runs eagerly inside substringSearch (checkpointed)
    // under autoBucketedScan=false; assert the physical property on
    // the same table + filter shape under the same setting
    val scanConf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prior = spark.conf.get(scanConf)
    val probePlan = try {
      spark.conf.set(scanConf, "false")
      val probe = spark.table("graft_test_trgm_postings")
        .filter(col("gram").isin("qui", "uic", "ick"))
      probe.collect()
      probe.queryExecution.executedPlan.toString
    } finally spark.conf.set(scanConf, prior)
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(probePlan)
    assert(m.isDefined, s"no bucket pruning in:\n$probePlan")
    assert(m.get.group(1).toInt < m.get.group(2).toInt,
      s"scan read every bucket:\n$probePlan")

    // point-lookup verify: both the candidate-id In and the contains
    // recheck reach the parquet scan as pushed filters — no shuffle,
    // no corpus-wide contains pass
    val df = TrigramIndex.substringSearch(spark, "graft_test_trgm", "quick")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("In(doc_id") && plan.contains("StringContains"),
      s"verify filters not pushed:\n$plan")
    assert(!plan.contains("Exchange"), s"verify must not shuffle:\n$plan")
  }
}
