package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySignalsSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  test("topNgramFraction: repeated bigram dominates") {
    // "a b" occurs 3 times out of 5 bigrams
    val r = one("a b a b a b")
      .select(TextAnalysis.topNgramFraction(col("text"), 2)).head.getDouble(0)
    assert(math.abs(r - 3.0 / 5.0) < 1e-12)
  }

  test("topNgramFraction: all-distinct text gives 1/n") {
    val r = one("a b c d e")
      .select(TextAnalysis.topNgramFraction(col("text"), 2)).head.getDouble(0)
    assert(math.abs(r - 1.0 / 4.0) < 1e-12)
  }

  test("topNgramFraction: empty and too-short inputs give 0") {
    assert(one("").select(TextAnalysis.topNgramFraction(col("text"), 2)).head.getDouble(0) == 0.0)
    assert(one("solo").select(TextAnalysis.topNgramFraction(col("text"), 2)).head.getDouble(0) == 0.0)
  }

  test("typeTokenRatio: distinct over total") {
    val r = one("a b a c").select(TextAnalysis.typeTokenRatio(col("text"))).head.getDouble(0)
    assert(math.abs(r - 3.0 / 4.0) < 1e-12)
    assert(one("").select(TextAnalysis.typeTokenRatio(col("text"))).head.getDouble(0) == 0.0)
  }

  test("ngrams keeps repeats in order (unlike Dedup.wordShingles)") {
    val g = one("x y x y").select(TextAnalysis.ngrams(col("text"), 2)).head.getSeq[String](0)
    assert(g == Seq("x y", "y x", "x y"))
  }

  test("PII scrub redacts emails then phones; counts match") {
    val df = one("write to bob.smith+tag@sub.example.org or 555-0123 now")
    val scrubbed = df.select(TextAnalysis.scrubPii(col("text"))).head.getString(0)
    assert(scrubbed == "write to <EMAIL> or <PHONE> now")
    assert(df.select(TextAnalysis.emailCount(col("text"))).head.getInt(0) == 1)
    assert(df.select(TextAnalysis.phoneCount(col("text"))).head.getInt(0) == 1)
  }

  test("PII scrub leaves clean text untouched") {
    val s = "no contact info here 12-34 a@b"
    assert(one(s).select(TextAnalysis.scrubPii(col("text"))).head.getString(0) == s)
  }

  test("phone pattern needs word boundaries") {
    // embedded in a longer digit run -> no match
    assert(one("9555-01999").select(TextAnalysis.phoneCount(col("text"))).head.getInt(0) == 0)
  }
}
