package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-TRAINED character-n-gram language identifier — multinomial
  * Naive Bayes over the top-K character n-grams (Cavnar & Trenkle
  * 1994 n-gram text categorization; the NB core of fastText-style
  * supervised bag-of-ngrams, Joulin et al. 2017). Replaces the
  * stopword-profile heuristic (`TextAnalysis.langId`) wherever a
  * labeled corpus exists to fit on: the heuristic only knows the
  * profile languages' function words, while this learns whatever
  * character distributions actually separate the labels.
  *
  * Integer-exact scoring (the CMS/HLL integer-internals rule): the
  * fit computes log-likelihoods ONCE on the driver over model-sized
  * aggregates and rounds them to integer MICRO-NATS; scoring is then
  * a pure integer sum, order-independent and bit-identical on any
  * partitioning and any engine — which is what makes a fitted
  * classifier fully oracle-able (the BPE/tree/PCA rendered-model
  * pattern).
  *
  * Scale: the fit is two corpus scans (one map-side-combined gram
  * count for the top-K vocabulary, one count over kept grams per
  * language) whose results are model-sized (≤ topK·|langs| rows) on
  * the driver. Prediction broadcasts the model and runs explode →
  * broadcast-join → one map-side-combined sum per doc: no shuffle of
  * anything wider than (id, L longs), no driver row data.
  */
object LangModel {

  /** A fitted model. `langs` ascending (the tie-break order);
    * `priorMicro(i)` = round(1e6·ln(n_i/N)); `grams` maps each kept
    * gram to its per-language micro-nat log-likelihood
    * round(1e6·ln((c+1)/(tot_l+V))) with add-one smoothing over the
    * V kept grams.
    */
  case class NbModel(n: Int, langs: Seq[String],
                     priorMicro: Seq[Long],
                     grams: Seq[(String, Seq[Long])])

  /** ALL character `n`-grams of a text (with multiplicity, the NB
    * event stream) by CODE POINT — Spark substring/length semantics,
    * matching DuckDB's, so a rendered oracle grams identically.
    * Shorter texts have no grams (the sequence(1,0) step trap).
    */
  def charNgrams(text: Column, n: Int): Column =
    when(length(text) >= n,
      transform(sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))

  def fit(df: DataFrame, langCol: String, textCol: String,
          n: Int = 3, topK: Int = 300): NbModel = {
    val exploded = df
      .select(col(langCol).as("lang"),
        explode(charNgrams(col(textCol), n)).as("gram"))
    // Deterministic vocabulary: top-K grams by global count, count
    // desc then gram asc — a take-ordered head, never a full sort.
    val kept = exploded.groupBy("gram").agg(count(lit(1)).as("ng"))
      .orderBy(col("ng").desc, col("gram")).limit(topK)
      .select("gram")
    val perLang = exploded.join(broadcast(kept), "gram")
      .groupBy("lang", "gram").agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val docCounts = df.groupBy(col(langCol).as("lang"))
      .agg(count(lit(1)).as("nd")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val langs = docCounts.keys.toSeq.sorted
    val total = docCounts.values.sum
    val v = perLang.map(_._2).distinct.sorted
    val totPerLang = langs.map(l =>
      l -> perLang.filter(_._1 == l).map(_._3).sum).toMap
    val byGramLang = perLang.map(t => (t._2, t._1) -> t._3).toMap
    def micro(x: Double): Long = math.round(x * 1e6)
    val weights = v.map { g =>
      g -> langs.map { l =>
        val c = byGramLang.getOrElse((g, l), 0L)
        micro(math.log((c + 1).toDouble / (totPerLang(l) + v.size)))
      }
    }
    NbModel(n, langs,
      langs.map(l => micro(math.log(docCounts(l).toDouble / total))),
      weights)
  }

  /** (id, pred_lang): argmax over per-language integer scores
    * prior + Σ weights of the doc's model grams; ties break by lang
    * ascending (sort_array over (−score, lang) structs). Docs with no
    * model gram fall back to the prior argmax.
    */
  def predict(df: DataFrame, idCol: String, textCol: String,
              model: NbModel): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val weightsDf = broadcast(model.grams.toDF("gram", "ws"))
    val sums = df
      .select(col(idCol).as("_id"),
        explode_outer(charNgrams(col(textCol), model.n)).as("gram"))
      .join(weightsDf, Seq("gram"), "left")
      .groupBy("_id")
      .agg(coalesce(sum(element_at(col("ws"), 1)), lit(0L)).as("s0"),
        model.langs.indices.drop(1).map(i =>
          coalesce(sum(element_at(col("ws"), i + 1)), lit(0L)).as(s"s$i")): _*)
    val ranked = model.langs.zipWithIndex.map { case (l, i) =>
      struct((-(col(s"s$i") + lit(model.priorMicro(i)))).as("neg"),
        lit(l).as("l"))
    }
    sums.select(col("_id").as(idCol),
      array_min(array(ranked: _*)).getField("l").as("pred_lang"))
  }

  private def sqlQuote(s: String): String =
    "'" + s.replace("'", "''") + "'"

  /** The fitted model rendered as a SQL VALUES body
    * `(gram, w_<lang0>, …)` — the oracle's lookup table. */
  def modelValuesSql(model: NbModel): String =
    model.grams.map { case (g, ws) =>
      "(" + (sqlQuote(g) +: ws.map(_.toString + "::BIGINT")).mkString(", ") + ")"
    }.mkString(",\n")

  /** Per-language micro-nat priors as a VALUES body `(lang, prior)`. */
  def priorValuesSql(model: NbModel): String =
    model.langs.zip(model.priorMicro)
      .map { case (l, p) => s"(${sqlQuote(l)}, ${p}::BIGINT)" }
      .mkString(", ")
}
