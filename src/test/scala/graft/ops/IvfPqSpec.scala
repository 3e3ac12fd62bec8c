package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
  lazy val queries = emb.filter($"vec_id" < 3)
    .select($"vec_id".as("qid"), $"embedding".as("qv"))

  private def resultSet(df: org.apache.spark.sql.DataFrame) =
    df.select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("all cells probed + corpus-covering overfetch = exact (rerank sees everything)") {
    IvfPq.buildIndex(emb, "vec_id", "embedding", "graft_test_ivfpq",
      nCells = 8, m = 8, kCodes = 16, buckets = 4)
    val got = resultSet(IvfPq.topKAgainstIndex(spark, "graft_test_ivfpq",
      queries, "qid", "qv", k = 10, nprobe = 8, overfetch = 64))
    val exact = resultSet(Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "qid", "qv", 10))
    assert(got == exact, s"missing=${(exact -- got).take(3)} extra=${(got -- exact).take(3)}")
  }

  test("bounded nprobe: recall vs brute force stays high, ADC scan is cell-pruned") {
    IvfPq.buildIndex(emb, "vec_id", "embedding", "graft_test_ivfpq_r",
      nCells = 8, m = 8, kCodes = 16, buckets = 4)
    val k = 10
    val got = IvfPq.topKAgainstIndex(spark, "graft_test_ivfpq_r",
        queries, "qid", "qv", k, nprobe = 4, overfetch = 8)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queries, "qid", "qv", k)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & exact).size.toDouble / exact.size
    // residual encoding (r11): the same m bytes quantize the small-
    // variance residual instead of the raw direction — recall at this
    // fixed (nprobe, overfetch) rose from the no-residual ≥0.7 floor
    assert(recall >= 0.9, s"recall $recall")
  }

  test("probe plan: zero index-side exchanges") {
    IvfPq.buildIndex(emb, "vec_id", "embedding", "graft_test_ivfpq_p",
      nCells = 8, m = 8, kCodes = 16, buckets = 4)
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val viaIdx = IvfPq.topKAgainstIndex(spark, "graft_test_ivfpq_p",
        queries, "qid", "qv", 10, nprobe = 4, overfetch = 4)
      // REAL post-AQE walk (r15): the former inputPlan-based assertion
      // was vacuous — see graft.PlanChecks
      val shuffledIdx = graft.PlanChecks.directlyShuffledScans(
        viaIdx, "graft_test_ivfpq_p")
      assert(shuffledIdx.isEmpty, s"index re-shuffled: $shuffledIdx")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("appendToIndex: index plus delta serves the rebuilt answer exactly") {
    val base = emb.filter($"vec_id" % 5 =!= 0)
    val delta = emb.filter($"vec_id" % 5 === 0)
    IvfPq.buildIndex(base, "vec_id", "embedding", "graft_test_ivfpq_a",
      nCells = 8, m = 8, kCodes = 16, buckets = 4)
    IvfPq.appendToIndex(spark, "graft_test_ivfpq_a", delta, "vec_id", "embedding")
    // all cells + covering overfetch: the rerank is exact over
    // whatever the index holds, so the answer must equal brute force
    // over base ∪ delta
    val got = resultSet(IvfPq.topKAgainstIndex(spark, "graft_test_ivfpq_a",
      queries, "qid", "qv", 10, nprobe = 8, overfetch = 64))
    val exact = resultSet(Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "qid", "qv", 10))
    assert(got == exact, s"missing=${(exact -- got).take(3)} extra=${(got -- exact).take(3)}")
  }

  test("compactIndex: serving results unchanged") {
    val base = emb.filter($"vec_id" % 3 =!= 0)
    IvfPq.buildIndex(base, "vec_id", "embedding", "graft_test_ivfpq_c",
      nCells = 8, m = 8, kCodes = 16, buckets = 4)
    IvfPq.appendToIndex(spark, "graft_test_ivfpq_c",
      emb.filter($"vec_id" % 3 === 0), "vec_id", "embedding")
    val before = resultSet(IvfPq.topKAgainstIndex(spark, "graft_test_ivfpq_c",
      queries, "qid", "qv", 10, nprobe = 4, overfetch = 8))
    IvfPq.compactIndex(spark, "graft_test_ivfpq_c")
    val after = resultSet(IvfPq.topKAgainstIndex(spark, "graft_test_ivfpq_c",
      queries, "qid", "qv", 10, nprobe = 4, overfetch = 8))
    assert(before == after)
  }

  test("recenterIndex: retrained models keep the exact-mode answer; meta validates") {
    IvfPq.buildIndex(emb, "vec_id", "embedding", "graft_test_ivfpq_m",
      nCells = 4, m = 8, kCodes = 16, buckets = 4)
    IvfPq.recenterIndex(spark, "graft_test_ivfpq_m", nCells = 8)
    val got = resultSet(IvfPq.topKAgainstIndex(spark, "graft_test_ivfpq_m",
      queries, "qid", "qv", 10, nprobe = 8, overfetch = 64))
    val exact = resultSet(Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "qid", "qv", 10))
    assert(got == exact)
    // dimension mismatch fails loudly, never returns garbage
    val bad = Seq((1L, Array(1.0f, 2.0f))).toDF("qid", "qv")
    val e = intercept[IllegalArgumentException] {
      IvfPq.topKAgainstIndex(spark, "graft_test_ivfpq_m", bad, "qid", "qv", 5)
    }
    assert(e.getMessage.contains("dim"), e.getMessage)
  }

  test("metadata-filtered IVF-PQ: filtered ≡ brute-force-filtered; metadata survives append + recenter") {
    // the 31g contract on the composed index: the predicate applies
    // to the pqcells scan BEFORE the ADC sum (r12)
    val withMeta = emb.withColumn("lang",
      element_at(typedLit(Seq("en", "de", "fr")),
        (pmod($"vec_id", lit(3)) + 1).cast("int")))
    IvfPq.buildIndex(withMeta.filter($"vec_id" < 400), "vec_id", "embedding",
      "graft_test_ivfpq_f", nCells = 8, m = 8, kCodes = 16, buckets = 4,
      metaCols = Seq("lang"))
    // append discovers the metadata columns from the persisted schema
    IvfPq.appendToIndex(spark, "graft_test_ivfpq_f",
      withMeta.filter($"vec_id" >= 400), "vec_id", "embedding")
    // recenter rewrites _pqcells from _vecs — metadata must survive
    IvfPq.recenterIndex(spark, "graft_test_ivfpq_f", lloydIters = 1)
    assert(spark.table("graft_test_ivfpq_f_pqcells").columns.contains("lang"))
    val got = resultSet(IvfPq.topKAgainstIndex(spark, "graft_test_ivfpq_f",
      queries, "qid", "qv", k = 10, nprobe = 8, overfetch = 64,
      filter = Some(col("lang") === "en")))
    val exact = resultSet(Similarity.bruteForceTopK(
      withMeta.filter($"lang" === "en"), "vec_id", "embedding",
      queries, "qid", "qv", 10))
    assert(got == exact,
      s"missing=${(exact -- got).take(3)} extra=${(got -- exact).take(3)}")
    assert(got.forall { case (_, id, _) => id % 3 == 0 })
  }
}
