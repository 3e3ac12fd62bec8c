package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degenerate-input behavior: every operator must return an empty
  * (correctly-schemed) result on empty input, never throw.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  lazy val emptyDocs = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
  lazy val emptyVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")

  test("dedup ops on empty input") {
    assert(Dedup.exactDedup(emptyDocs, "text", "doc_id").count() == 0)
    assert(Dedup.minhashPairs(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.simhashPairs(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.blockedJaccardPairs(emptyDocs, "doc_id", "text", "source", 1, 0.8).count() == 0)
  }

  test("similarity ops on empty corpus") {
    val q = Seq((0L, Array(1.0f, 0.0f))).toDF("qid", "qv")
    assert(Similarity.bruteForceTopK(emptyVecs, "vec_id", "embedding", q, "qid", "qv", 5).count() == 0)
    assert(Similarity.bruteForceTopKAgg(emptyVecs, "vec_id", "embedding", q, "qid", "qv", 5).count() == 0)
    assert(Similarity.lshTopK(emptyVecs, "vec_id", "embedding", q, "qid", "qv", 5).count() == 0)
    assert(Similarity.cosinePairs(emptyVecs, "vec_id", "embedding", 0.5).count() == 0)
  }

  test("sessionize and asof on empty input") {
    val emptyEvents = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(graft.streaming.Sessionize.sessionize(emptyEvents).count() == 0)
    val left = Seq((1L, 5L, "L")).toDF("k", "t", "lid")
    val emptyRight = Seq.empty[(Long, Long, String)].toDF("k", "t", "rid")
    val out = AsOf.asofJoinLeft(left, emptyRight, "k", "t", "t", "rid").collect()
    assert(out.length == 1 && out.head.getAs[String]("right_rid") == null)
  }

  test("text analysis on empty and whitespace strings") {
    val df = Seq("", "   ", "\t\n").toDF("text")
    val out = df.select(
      TextAnalysis.wsTokenCount($"text").as("n"),
      TextAnalysis.qualityScore($"text").as("q"),
      TextAnalysis.langId($"text").as("l"),
      TextAnalysis.fingerprint($"text").as("fp")).collect()
    out.foreach { r =>
      assert(r.getInt(0) == 0)
      assert(!r.isNullAt(1))
      assert(r.getString(2) == "de") // all-zero tie -> alphabetical
    }
  }
}
