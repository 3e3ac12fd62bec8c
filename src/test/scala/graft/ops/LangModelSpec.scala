package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus-trained char-n-gram NB language ID: learnability on planted
  * multilingual text (the capability the stopword heuristic measurably
  * lacks — 0.00-0.10 non-English agreement on the same corpus), plus
  * the determinism contracts that make the rendered-model oracle hold.
  */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  private val banks = Map(
    "de" -> Seq("der", "schnelle", "braune", "fuchs", "springt", "über",
      "den", "faulen", "hund", "während", "zeitung", "morgens"),
    "en" -> Seq("the", "quick", "brown", "fox", "jumps", "over",
      "lazy", "dog", "while", "reading", "morning", "paper"),
    "es" -> Seq("el", "rápido", "zorro", "marrón", "salta", "sobre",
      "perro", "perezoso", "mientras", "lee", "periódico", "mañana"),
    "fr" -> Seq("le", "renard", "brun", "rapide", "saute", "sur",
      "chien", "paresseux", "pendant", "lecture", "journal", "matin"),
    "zh" -> Seq("敏捷", "的", "棕色", "狐狸", "跳过", "了",
      "懒", "狗", "同时", "阅读", "早晨", "新闻"))

  /** 60 deterministic docs per language, 30 words each. */
  private def planted(perLang: Int) =
    banks.toSeq.sortBy(_._1).flatMap { case (lang, ws) =>
      (0 until perLang).map { i =>
        val text = (0 until 30)
          .map(j => ws((i * 7 + j * 13) % ws.size)).mkString(" ")
        (lang.hashCode.toLong * 1000 + i, lang, text)
      }
    }.toDF("id", "lang", "text")

  test("near-perfect held-out agreement on every language") {
    val docs = planted(60)
    val train = docs.filter(pmod(col("id"), lit(3)) =!= 0)
    val test0 = docs.filter(pmod(col("id"), lit(3)) === 0)
    val model = LangModel.fit(train, "lang", "text", n = 3, topK = 300)
    val agree = LangModel.predict(test0, "id", "text", model)
      .join(test0.select("id", "lang"), "id")
      .groupBy("lang")
      .agg(avg(when(col("pred_lang") === col("lang"), 1.0)
        .otherwise(0.0)).as("acc"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(agree.keySet === banks.keySet)
    agree.foreach { case (l, a) =>
      assert(a >= 0.9, s"lang $l agreement $a < 0.9 — the trained model " +
        "must far exceed the heuristic's 0.00-0.10")
    }
  }

  test("model weights are integer micro-nats and fit is deterministic") {
    val docs = planted(20)
    val m1 = LangModel.fit(docs, "lang", "text", n = 3, topK = 100)
    val m2 = LangModel.fit(docs, "lang", "text", n = 3, topK = 100)
    assert(m1 === m2, "same corpus must fit the identical model")
    assert(m1.langs === m1.langs.sorted, "langs ascending = tie-break order")
    assert(m1.grams.size <= 100)
    assert(m1.grams.forall(_._2.size === m1.langs.size))
  }

  test("prior-only fallback and ascending-lang tie-break for gramless docs") {
    val train = Seq((1L, "aa", "xxxxxx"), (2L, "bb", "yyyyyy"),
      (3L, "aa", "xxxxxx"), (4L, "bb", "yyyyyy"))
      .toDF("id", "lang", "text")
    val model = LangModel.fit(train, "lang", "text", n = 3, topK = 10)
    // text shorter than n: no grams, score = prior alone; equal priors
    // (2 docs each) tie-break to the ascending-first lang.
    val pred = LangModel.predict(Seq((9L, "z")).toDF("id", "text"),
      "id", "text", model).collect()
    assert(pred.head.getString(1) === "aa")
  }

  test("charNgrams grams by code point and guards short texts") {
    val df = Seq(("😀😀😀😀", 1), ("ab", 2), ("", 3)).toDF("t", "k")
    val out = df.select(col("k"),
      LangModel.charNgrams(col("t"), 3).as("g")).collect()
      .map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    // 4 code points -> 2 trigrams, each of 3 code points (6 chars)
    assert(out(1) === Seq("😀😀😀", "😀😀😀"))
    assert(out(2) === Seq())
    assert(out(3) === Seq())
  }

  test("rendered SQL escapes quotes and covers every model gram") {
    val train = Seq((1L, "fr", "aujourd'hui l'eau"), (2L, "en", "today water"))
      .toDF("id", "lang", "text")
    val model = LangModel.fit(train, "lang", "text", n = 3, topK = 50)
    val sql = LangModel.modelValuesSql(model)
    assert(sql.contains("''"), "apostrophe grams must be SQL-escaped")
    assert(sql.linesIterator.size === model.grams.size)
    assert(LangModel.priorValuesSql(model).contains("'en'"))
  }
}
