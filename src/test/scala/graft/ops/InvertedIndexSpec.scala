package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted inverted text index: exact phrase/token semantics on
  * hand-computable fixtures, append ≡ rebuild, parameter-guarded
  * probes, and the bucket-pruned probe scan (the scale claim: probe
  * cost is O(queried tokens' postings), not a corpus scan).
  */
class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (0L, "spark scan table table scan spark"),
    (1L, "w w w w"),
    (2L, "table scan"),
    (3L, ""),
    (4L, "spark table table table scan")
  ).toDF("doc_id", "text")

  private lazy val built: Unit =
    TextIndex.buildInvertedIndex(corpus, "doc_id", "text",
      "graft_test_inv", buckets = 4)

  test("phrase search: exact positional matches, overlaps counted") {
    built
    val got = TextIndex.phraseSearch(spark, "graft_test_inv", "table table")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // doc 0: one match; doc 4: "table table table" = starts 1,2 → 2
    assert(got == Map(0L -> 1L, 4L -> 2L))
    val ww = TextIndex.phraseSearch(spark, "graft_test_inv", "w w")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ww == Map(1L -> 3L)) // overlapping starts 0,1,2
  }

  test("phrase search: absent token → empty; single token = tf docs") {
    built
    assert(TextIndex.phraseSearch(spark, "graft_test_inv", "nope table")
      .isEmpty)
    val single = TextIndex.phraseSearch(spark, "graft_test_inv", "scan")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(single == Map(0L -> 2L, 2L -> 1L, 4L -> 1L))
    intercept[IllegalArgumentException] {
      TextIndex.phraseSearch(spark, "graft_test_inv", "   ")
    }
  }

  test("token search: tf per containing doc") {
    built
    val got = TextIndex.tokenSearch(spark, "graft_test_inv", "spark")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(0L -> 2L, 4L -> 1L))
  }

  test("probe scan is bucket-pruned, not a corpus scan") {
    built
    val df = TextIndex.phraseSearch(spark, "graft_test_inv", "table table")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plan)
    assert(m.isDefined, s"no bucket pruning in:\n$plan")
    assert(m.get.group(1).toInt < m.get.group(2).toInt,
      s"scan read every bucket:\n$plan")
  }

  test("append ≡ rebuild; compaction changes nothing") {
    val part = corpus.filter(col("doc_id") < 3)
    val delta = corpus.filter(col("doc_id") >= 3)
    TextIndex.buildInvertedIndex(part, "doc_id", "text",
      "graft_test_inv_app", buckets = 4)
    TextIndex.appendToInvertedIndex(spark, "graft_test_inv_app",
      delta, "doc_id", "text")
    built
    def probe(name: String) =
      TextIndex.phraseSearch(spark, name, "table table")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // bm25 exercises _docs (dl + corpus stats) across the append too
    def rank(name: String) =
      TextIndex.bm25(spark, name, "spark table")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(probe("graft_test_inv_app") == probe("graft_test_inv"))
    assert(rank("graft_test_inv_app") == rank("graft_test_inv"))
    TextIndex.compactInvertedIndex(spark, "graft_test_inv_app")
    assert(probe("graft_test_inv_app") == probe("graft_test_inv"))
    assert(rank("graft_test_inv_app") == rank("graft_test_inv"))
  }

  test("bm25 matches a from-first-principles reference") {
    built
    // reference implementation straight from Robertson & Zaragoza
    // eq. 3.15 over the fixture corpus
    val texts = Map(0L -> "spark scan table table scan spark",
      1L -> "w w w w", 2L -> "table scan", 3L -> "",
      4L -> "spark table table table scan")
    val toks = texts.view.mapValues(
      _.split("\\s+").filter(_.nonEmpty).toSeq).toMap
    val n = texts.size
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    def expected(terms: Seq[String]): Map[Long, Double] = {
      val dfOf = terms.map(t =>
        t -> toks.values.count(_.contains(t))).toMap
      toks.flatMap { case (id, ts) =>
        val s = terms.map { t =>
          val tf = ts.count(_ == t).toDouble
          if (tf == 0) 0.0
          else math.log(1 + (n - dfOf(t) + 0.5) / (dfOf(t) + 0.5)) *
            tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * ts.size / avgdl))
        }.sum
        if (s > 0) Some(id -> BigDecimal(s)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        else None
      }
    }
    val got = TextIndex.bm25(spark, "graft_test_inv", "spark table")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got == expected(Seq("spark", "table")))
    intercept[IllegalArgumentException] {
      TextIndex.bm25(spark, "graft_test_inv", " ")
    }
  }

  test("meta guards the probe: incompatible tokenizer rejected") {
    built
    graft.io.Sources.writeTable(
      Seq("chars").toDF("tokenizer"), "graft_test_inv_bad_meta")
    spark.sql("CREATE TABLE graft_test_inv_bad_postings USING parquet " +
      "AS SELECT 'x' AS token, 0L AS doc_id, array(0) AS positions")
    intercept[IllegalArgumentException] {
      TextIndex.phraseSearch(spark, "graft_test_inv_bad", "x")
    }
  }
}
