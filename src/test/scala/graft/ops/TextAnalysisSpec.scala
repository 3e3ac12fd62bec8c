package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("text").select(c.as("v")).head().getAs[T]("v")

  test("whitespace token count") {
    assert(one[Int](TextAnalysis.wsTokenCount(col("text")), "a b  c") == 3)
    assert(one[Int](TextAnalysis.wsTokenCount(col("text")), "  hello  ") == 1)
    assert(one[Int](TextAnalysis.wsTokenCount(col("text")), "") == 0)
    assert(one[Int](TextAnalysis.wsTokenCount(col("text")), "   ") == 0)
  }

  test("regex token count (letters / digits / punct)") {
    assert(one[Int](TextAnalysis.regexTokenCount(col("text")), "ab 12 c,d") == 5)
    assert(one[Int](TextAnalysis.regexTokenCount(col("text")), "") == 0)
  }

  test("ratios") {
    assert(one[Double](TextAnalysis.alphaRatio(col("text")), "ab1 ") == 0.5)
    assert(math.abs(one[Double](TextAnalysis.punctRatio(col("text")), "a,b") - 1.0 / 3) < 1e-12)
    assert(one[Double](TextAnalysis.meanWordLen(col("text")), "ab cd") == 2.0)
    assert(one[Double](TextAnalysis.alphaRatio(col("text")), "") == 0.0)
  }

  test("stopword ratio and quality score bounds") {
    val r = one[Double](TextAnalysis.stopwordRatio(col("text")), "the cat sat on a mat")
    assert(math.abs(r - 2.0 / 6) < 1e-12) // "the", "a"
    val q = one[Double](TextAnalysis.qualityScore(col("text")), "the quick brown fox jumps")
    assert(q >= 0.0 && q <= 1.0)
  }

  test("language id") {
    assert(one[String](TextAnalysis.langId(col("text")), "the cat is in the hat") == "en")
    assert(one[String](TextAnalysis.langId(col("text")), "der hund ist ein tier und") == "de")
    assert(one[String](TextAnalysis.langId(col("text")), "le chat est un animal et les") == "fr")
    // no hits at all -> tie -> alphabetically first profile
    assert(one[String](TextAnalysis.langId(col("text")), "zzz qqq") == "de")
  }

  test("rolling-hash fingerprint") {
    // ((0*31+97)*31+98)*31+99 = 96354 — matches DuckDB list_reduce oracle
    assert(one[Long](TextAnalysis.fingerprint(col("text")), "abc") == 96354L)
    assert(one[Long](TextAnalysis.fingerprint(col("text")), "") == 0L)
    // deterministic and distinct for different content
    assert(one[Long](TextAnalysis.fingerprint(col("text")), "abd") !=
           one[Long](TextAnalysis.fingerprint(col("text")), "abc"))
  }
}
