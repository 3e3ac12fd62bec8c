package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")

  test("fit separates a linearly separable synthetic corpus") {
    val df = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, "good clean prose tokens here", 1)
      else (i.toLong, "spam junk noise garbage words", 0)
    }.toDF("doc_id", "text", "label")
    val m = QualityClassifier.fit(df, "doc_id", "text",
      col("label") === 1, buckets = 64, iters = 25, lr = 5.0)
    val scored = QualityClassifier.score(df, "doc_id", "text",
      col("label") === 1, m).collect()
    assert(scored.forall(r => (r.getAs[Double]("margin") > 0) ==
      (r.getAs[Double]("y") == 1.0)), "train set must separate")
  }

  test("distilling the quality-score gate: high train accuracy, sane weights") {
    // the published quality-classifier pattern (the GPT-3 LR filter,
    // CCNet): learn a fast linear model against a labeled quality
    // signal — here the house heuristic gate qualityScore ≥ 0.6
    // (57/43 on this corpus; the Gopher gate is degenerate here —
    // its required-stopword rule fails every synthetic doc). The
    // score is dominated by the token-count term, carried by the
    // explicit length feature (bucket frequencies are
    // length-normalized), with the stopword/alpha terms carried by
    // the token buckets.
    val label = TextAnalysis.qualityScore(col("text")) >= 0.6
    val m = QualityClassifier.fit(docs, "doc_id", "text",
      label, buckets = 512, iters = 40, lr = 5.0)
    val scored = QualityClassifier.score(docs, "doc_id", "text", label, m)
    val acc = scored.select(
        ((col("margin") > 0) === (col("y") === 1.0)).cast("int").as("ok"))
      .agg(avg("ok")).head().getDouble(0)
    assert(acc >= 0.9, s"train accuracy $acc < 0.9")
    assert(m.lengthWeight > 0,
      "the score's token-count term must surface as a positive length weight")
  }

  test("fit is deterministic and margins are exactly reproducible") {
    def run() = {
      val m = QualityClassifier.fit(docs, "doc_id", "text",
        col("lang") === "en", buckets = 128, iters = 10, lr = 5.0)
      (m.weights.toSeq,
        QualityClassifier.score(docs, "doc_id", "text", col("lang") === "en", m)
          .orderBy("doc_id").select("margin").as[Double].collect().toSeq)
    }
    val (w1, s1) = run(); val (w2, s2) = run()
    assert(w1 == w2, "weights must be bit-identical across runs")
    assert(s1 == s2, "margins must be bit-identical across runs")
  }

  test("rendered SQL weights re-score identically (Spark as the SQL engine)") {
    val m = QualityClassifier.fit(docs, "doc_id", "text",
      col("lang") === "en", buckets = 256, iters = 15, lr = 5.0)
    docs.createOrReplaceTempView("qc_docs")
    val biasNano = new java.math.BigDecimal(m.bias * 1e9)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    val sqlMargins = spark.sql(
      s"""WITH w(bkt, wv) AS ${QualityClassifier.weightsValuesSql(m)},
         |tk AS (SELECT doc_id,
         |         explode(filter(split(text, '\\\\s+'), t -> length(t) > 0)) AS tok
         |       FROM qc_docs),
         |cnt AS (SELECT doc_id,
         |          pmod(CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT), 256) AS bkt,
         |          count(*) AS c
         |        FROM tk GROUP BY 1, 2),
         |tot AS (SELECT doc_id, CAST(sum(c) AS DOUBLE) AS n_tok FROM cnt GROUP BY 1),
         |contrib AS (SELECT c.doc_id,
         |              CAST(round((c.c / t.n_tok) * w.wv * 1e9) AS BIGINT) AS nano
         |            FROM cnt c JOIN tot t ON c.doc_id = t.doc_id
         |            JOIN w ON w.bkt = c.bkt AND w.bkt < 256),
         |lenc AS (SELECT d.doc_id,
         |           CAST(round((least(coalesce(t.n_tok, 0), 1000) / 100.0)
         |             * (SELECT wv FROM w WHERE bkt = 257) * 1e9) AS BIGINT) AS nano
         |         FROM qc_docs d LEFT JOIN tot t ON d.doc_id = t.doc_id)
         |SELECT d.doc_id,
         |  ($biasNano + coalesce(s.nano, 0) + l.nano) / 1e9 AS margin
         |FROM qc_docs d
         |LEFT JOIN (SELECT doc_id, sum(nano) AS nano FROM contrib GROUP BY 1) s
         |  ON d.doc_id = s.doc_id
         |JOIN lenc l ON d.doc_id = l.doc_id
         |ORDER BY doc_id""".stripMargin)
      .select("margin").as[Double].collect().toSeq
    val apiMargins = QualityClassifier.score(docs, "doc_id", "text",
        col("lang") === "en", m)
      .orderBy("doc_id").select("margin").as[Double].collect().toSeq
    assert(sqlMargins == apiMargins,
      "rendered-SQL margins must be bit-identical to the API margins")
  }

  test("empty/whitespace docs score exactly the bias") {
    val df = Seq((1L, "some words", 1), (2L, "", 0), (3L, "   ", 0))
      .toDF("doc_id", "text", "label")
    val m = QualityClassifier.fit(df, "doc_id", "text",
      col("label") === 1, buckets = 32, iters = 5, lr = 1.0)
    val margins = QualityClassifier.score(df, "doc_id", "text",
        col("label") === 1, m)
      .orderBy("doc_id").select("margin").as[Double].collect()
    val biasMargin = new java.math.BigDecimal(m.bias * 1e9)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact() / 1e9
    assert(margins(1) == biasMargin && margins(2) == biasMargin)
  }
}
