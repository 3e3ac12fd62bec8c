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

  test("n-gram contamination counts distinct shared grams per doc") {
    import spark.implicits._
    // bench doc = 10 tokens -> 3 distinct 8-grams (positions 0,1,2)
    val bench = Seq((100L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "a b c d e f g h i j"),        // identical -> all 3 grams
      (2L, "x a b c d e f g h y"),        // shares gram a..h only -> 1
      (3L, "totally unrelated words only here now and then again more"),
      (4L, "a b c d e f g")               // shorter than n -> 0
    ).toDF("doc_id", "text")
    val got = TextAnalysis.ngramContamination(train, "doc_id", "text",
        bench, "text", n = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got == Map(1L -> ((3L, true)), 2L -> ((1L, true)),
      3L -> ((0L, false)), 4L -> ((0L, false))), got.toString)
  }

  test("LM scores: add-one-smoothed bigram log-likelihood, exact on a toy corpus") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x"))
      .toDF("doc_id", "text")
    // corpus bigrams: "a b" x3, "b a" x1; prefixes: a->3, b->1; V=3
    val pAB = math.log(4.0 / 6.0)  // (3+1)/(3+3)
    val pBA = math.log(2.0 / 4.0)  // (1+1)/(1+3)
    val got = TextAnalysis.lmScores(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) null else r.getDouble(1), r.getLong(2)))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((r6((2 * pAB + pBA) / 3.0), 3L)), got(1L).toString)
    assert(got(2L) == ((r6(pAB), 1L)))
    assert(got(3L) == ((null, 0L)), "single-token doc has no bigrams")
  }

  test("vocabularyOverlap: pairwise Jaccard over distinct slice vocabularies") {
    val docs = Seq(
      (1L, "a b c", "g1"), (2L, "c a", "g1"),   // g1 vocab {a,b,c}
      (3L, "b c d", "g2"),                       // g2 vocab {b,c,d}
      (4L, "x", "g3"),                           // g3 vocab {x}
      (5L, "", "g3")                             // empty text adds nothing
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.vocabularyOverlap(docs, "source", "text")
      .orderBy("g_a", "g_b")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    // only the sharing pair appears; duplicates inside a slice count once
    assert(got === Seq(("g1", "g2", 3L, 3L, 2L, 0.5)))
  }

  test("gopherFilter: each rule fails independently, keep is the conjunction") {
    val good = "the cat and the dog have been to the park of wonders " +
      "that we all know and love with joy"                 // passes all
    val fewTokens = "the cat and that dog"                  // < 6 tokens at minTokens=6? use minTokens high enough
    val shortWords = "a b c d e f g h i j the of and to be" // mean word len < 3
    val symbols = "### $$$ %%% ^^^ &&& the of and *** !!! (((" // alpha frac < 0.8
    val noStops = "quick brown foxes jump over seven lazy sleeping hounds nearby" // no required stopwords... "over"? not in list
    val repeated = "the cat the cat the cat the cat the cat of dogs" // top bigram frac > 0.2
    val docs = Seq((1L, good), (2L, fewTokens), (3L, shortWords),
      (4L, symbols), (5L, noStops), (6L, repeated), (7L, null))
      .toDF("doc_id", "text")
    val got = TextAnalysis.gopherFilter(docs, "doc_id", "text", minTokens = 10)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5), r.getBoolean(6)))
      .toMap
    assert(got(1L) === ((true, true, true, true, true, true)))
    assert(!got(2L)._1 && !got(2L)._6, "token-count rule must fail doc 2")
    assert(!got(3L)._2 && !got(3L)._6, "mean-word-len rule must fail doc 3")
    assert(!got(4L)._3 && !got(4L)._6, "alpha-words rule must fail doc 4")
    assert(!got(5L)._4 && !got(5L)._6, "stopword rule must fail doc 5")
    assert(!got(6L)._5 && !got(6L)._6, "repetition rule must fail doc 6")
    // null text evaluates as empty -> definite false keep, never null
    assert(!got(7L)._1 && !got(7L)._6, "null text must be a real reject")
  }

  test("dataCard: per-group accounting with dup, empty and PII rows") {
    val docs = Seq(
      (1L, "hello world you the", "s0", "en"),
      (2L, "hello world you the", "s0", "en"),   // exact dup of 1
      (3L, "", "s0", "en"),                       // empty
      (4L, "reach me a1@b.co now", "s0", "de"),   // email PII
      (5L, "call 555-0199 today", "s0", "de"),    // phone PII
      (6L, "plain text here", "s1", "en"),
      (7L, null, "s1", "en")                     // null text accounts as empty
    ).toDF("doc_id", "text", "source", "lang")
    val got = TextAnalysis.dataCard(docs, Seq("source", "lang"), "text")
      .orderBy("source", "lang")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getLong(6),
        r.getLong(7), r.getLong(8))).toSeq
    assert(got.map(g => (g._1, g._2, g._3)) ===
      Seq(("s0", "de", 2L), ("s0", "en", 3L), ("s1", "en", 2L)))
    val en = got(1)
    assert(en._4 === 8L)  // tokens: 4 + 4 + 0
    assert(en._7 === 0L)  // no PII
    assert(en._8 === 1L)  // one empty doc
    assert(en._9 === 2L)  // two distinct contents among three docs
    val de = got(0)
    assert(de._7 === 2L)  // email + phone both flagged
    assert(de._9 === 2L)
    val s1 = got(2)
    assert(s1._8 === 1L)  // the null-text doc counts as empty...
    assert(s1._3 === 2L)  // ...and is still accounted in n_docs
    got.foreach(g => assert(g._6 > 0.0 && g._6 <= 1.0))
  }

  test("sliceKlDivergence matches hand-computed KL against the corpus mix") {
    // corpus tokens: a:2 b:2 (T=4); g1 = {a:2, b:1} (T=3), g2 = {b:1}
    val docs = Seq(
      (1L, "a a b", "g1"),
      (2L, "b", "g2")).toDF("doc_id", "text", "source")
    val got = TextAnalysis.sliceKlDivergence(docs, "source", "text")
      .orderBy("g").as[(String, Long, Long, Double)].collect().toSeq
    def r(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val kl1 = 2.0 / 3 * math.log((2.0 / 3) / 0.5) +
      1.0 / 3 * math.log((1.0 / 3) / 0.5)
    val kl2 = 1.0 * math.log(1.0 / 0.5)
    assert(got === Seq(("g1", 3L, 2L, r(kl1)), ("g2", 1L, 1L, r(kl2))))
  }

  test("rolling-hash fingerprint") {
    // ((0*31+97)*31+98)*31+99 = 96354 — matches DuckDB list_reduce oracle
    assert(one[Long](TextAnalysis.fingerprint(col("text")), "abc") == 96354L)
    assert(one[Long](TextAnalysis.fingerprint(col("text")), "") == 0L)
    // deterministic and distinct for different content
    assert(one[Long](TextAnalysis.fingerprint(col("text")), "abd") !=
           one[Long](TextAnalysis.fingerprint(col("text")), "abc"))
  }

  /** Independent driver-side derivation of the Gopher dup-gram stats
    * definition (duplicated = gram occurs ≥ 2× in-doc; token covered
    * iff under ≥ 1 duplicated occurrence). */
  private def refDupStats(text: String, n: Int): (Long, Double, Double) = {
    val toks = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val grams = toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
    val m = grams.size
    val counts = grams.groupBy(identity).map { case (g, v) => g -> v.size }
    val flags = grams.map(counts(_) >= 2)
    val dupOcc = flags.count(identity)
    val covered = (1 to toks.size).count { t =>
      (((t - n + 1) max 1) to (t min m)).exists(s => flags(s - 1))
    }
    (toks.size.toLong,
      if (m == 0) 0.0 else dupOcc.toDouble / m,
      if (toks.isEmpty) 0.0 else covered.toDouble / toks.size)
  }

  test("dupGramStats kernel ≡ independent reference (hand fixture + random docs)") {
    // hand-checkable: grams ab,ba,ab,bc — 'a b' duplicated (2 of 4
    // occurrences), covering tokens 1-2 and 3-4 of 5
    val hand = TextAnalysis.dupGramStats(
        Seq((1L, "a b a b c")).toDF("doc_id", "text"), "doc_id", "text", 2)
      .head()
    assert(hand.getLong(1) == 5L)
    assert(math.abs(hand.getDouble(2) - 0.5) < 1e-9)
    assert(math.abs(hand.getDouble(3) - 0.8) < 1e-9)

    val rnd = new scala.util.Random(13)
    val words = Vector("x", "y", "z", "w", "v")
    val docs = ((0 until 50).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(60))(words(rnd.nextInt(words.size)))
        .mkString(" "))
    } ++ Seq((100L, ""), (101L, "solo"), (102L, "q q q q q q")))
    for (n <- Seq(2, 3)) {
      val got = TextAnalysis.dupGramStats(
          docs.toDF("doc_id", "text"), "doc_id", "text", n)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
      for ((id, text) <- docs) {
        val (nt, dg, dt) = refDupStats(text, n)
        val (gnt, gdg, gdt) = got(id)
        assert(gnt == nt, s"doc $id n=$n tokens")
        assert(math.abs(gdg - dg) < 5e-7, s"doc $id n=$n dup_gram_frac")
        assert(math.abs(gdt - dt) < 5e-7, s"doc $id n=$n dup_token_frac")
      }
    }
  }

  test("collocations: sketch+recount equals naive exact; PMI ranks bound pairs above chance pairs") {
    import spark.implicits._
    // "san francisco" always collocated; "the"/"cat" frequent but
    // independently distributed → lower PMI despite similar counts
    val docs = (Seq.fill(30)("san francisco") ++
      Seq.fill(15)("the cat") ++ Seq.fill(15)("cat the") ++
      Seq.fill(10)("the dog ran")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextAnalysis.collocations(docs, "text", support = 0.05)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    // naive exact reference via groupBy over all bigrams
    val ref = docs.select(explode(TextAnalysis.ngrams(col("text"), 2)).as("bg"))
      .groupBy("bg").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nBg = ref.values.sum
    val minN = math.ceil(0.05 * nBg).toLong
    assert(got.keys.map(p => s"${p._1} ${p._2}").toSet ===
      ref.filter(_._2 >= minN).keySet)
    got.foreach { case (k, (n, _)) => assert(ref(s"${k._1} ${k._2}") === n) }
    assert(got(("san", "francisco"))._2 > got(("the", "cat"))._2)
  }

  test("categoryPmi matches hand-computed cells; MI is symmetric and non-negative") {
    import spark.implicits._
    // 2×2 with dependence: (en,web) 3, (en,books) 1, (de,web) 1, (de,books) 3
    val rows = Seq.fill(3)(("en", "web")) ++ Seq(("en", "books")) ++
      Seq(("de", "web")) ++ Seq.fill(3)(("de", "books"))
    val df = rows.toDF("lang", "source")
    val got = TextAnalysis.categoryPmi(df, "lang", "source")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    // p(en,web)=3/8, p(en)=1/2, p(web)=1/2 → pmi = ln(3/2)
    assert(got(("en", "web"))._1 === 3L)
    assert(math.abs(got(("en", "web"))._2 - math.log(1.5)) < 1e-6)
    assert(math.abs(got(("en", "books"))._2 - math.log(0.5)) < 1e-6)
    val miAB = TextAnalysis.mutualInformation(df, "lang", "source")
      .collect()(0).getDouble(0)
    val miBA = TextAnalysis.mutualInformation(df, "source", "lang")
      .collect()(0).getDouble(0)
    assert(miAB === miBA)
    assert(miAB > 0.0) // dependent by construction
    // independence → MI 0
    val indep = (for (a <- Seq("x", "y"); b <- Seq("p", "q")) yield (a, b))
      .toDF("a", "b")
    assert(TextAnalysis.mutualInformation(indep, "a", "b")
      .collect()(0).getDouble(0) === 0.0)
  }
}
