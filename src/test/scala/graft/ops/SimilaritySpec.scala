package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
  lazy val queries = emb.filter($"vec_id" < 3)
    .select($"vec_id".as("qid"), $"embedding".as("qv"))

  test("vector ops basics") {
    val df = Seq((Array(1.0f, 2.0f, 2.0f), Array(2.0f, 0.0f, 1.0f))).toDF("a", "b")
    val a = VectorOps.toDoubleVec($"a"); val b = VectorOps.toDoubleVec($"b")
    val r = df.select(VectorOps.dot(a, b).as("d"), VectorOps.norm(a).as("na"),
      VectorOps.cosine(a, b).as("c")).head()
    assert(r.getDouble(0) == 4.0)
    assert(r.getDouble(1) == 3.0)
    assert(math.abs(r.getDouble(2) - 4.0 / (3.0 * math.sqrt(5.0))) < 1e-12)
  }

  test("cosine of zero vector is 0, not NaN") {
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 0.0f))).toDF("a", "b")
    val c = df.select(VectorOps.cosine(
      VectorOps.toDoubleVec($"a"), VectorOps.toDoubleVec($"b")).as("c")).head().getDouble(0)
    assert(c == 0.0)
  }

  test("brute force top-k: self is rank 1 with cosine 1") {
    val top = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "qid", "qv", 5)
    val r1 = top.filter($"rank" === 1).select("qid", "id", "cos").collect()
    assert(r1.length == 3)
    r1.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), "rank-1 neighbor must be the query itself")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)
    }
    assert(top.count() == 15)
  }

  test("LSH top-k recall vs brute force") {
    val k = 10
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", queries, "qid", "qv", k)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(emb, "vec_id", "embedding", queries, "qid", "qv", k,
      bitsPerTable = 4, tables = 16)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH recall $recall too low")
  }

  test("IVF top-k recall vs brute force") {
    val k = 10
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", queries, "qid", "qv", k)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(emb, "vec_id", "embedding", queries, "qid", "qv", k,
      nCells = 8, nprobe = 4)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"IVF recall $recall too low")
    // every IVF result must be a true corpus vector with a real cosine
    assert(approx.nonEmpty)
  }

  test("persisted IVF index serves query batches without re-assignment") {
    // build ONCE; two different query batches probe the SAME persisted
    // assignment with results matching the inline ivfTopK (identical
    // centroids: the index stores the ones it trained) and zero
    // exchanges over any index table
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", "graft_test_ivf",
      nCells = 8, lloydIters = 1, buckets = 4)
    val k = 10
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      for (qs <- Seq(queries, emb.filter($"vec_id" >= 3 && $"vec_id" < 6)
          .select($"vec_id".as("qid"), $"embedding".as("qv")))) {
        val viaIdx = Similarity.ivfTopKAgainstIndex(spark, "graft_test_ivf",
          qs, "qid", "qv", k, nprobe = 8) // all cells probed => exact
        import org.apache.spark.sql.execution.FileSourceScanExec
        import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
        import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        val plan = viaIdx.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.inputPlan
          case p => p
        }
        val shuffledIdx = plan.collect {
          case e: ShuffleExchangeExec => e.child.collect {
            case s: FileSourceScanExec
              if s.tableIdentifier.exists(_.table.startsWith("graft_test_ivf")) => s
          }.size
        }.sum
        assert(shuffledIdx == 0, s"index re-shuffled:\n$plan")
        val got = viaIdx.select("qid", "id", "rank").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        // probing ALL cells makes the index path exact - compare to
        // brute force ground truth
        val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
            qs, "qid", "qv", k)
          .select("qid", "id", "rank").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        assert(got == exact, s"missing=${(exact -- got).take(3)} extra=${(got -- exact).take(3)}")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("quantized two-stage top-k recall vs brute force") {
    val k = 10
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", queries, "qid", "qv", k)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.quantizedTopK(emb, "vec_id", "embedding", queries, "qid", "qv", k)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // int8 quantization error is tiny and the rerank is exact over a
    // 4x overfetch, so recall should be near-perfect
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"quantized recall $recall too low")
    // reranked scores are exact cosines: the top-1 per query must
    // match brute force exactly
    val exactTop1 = Similarity.bruteForceTopK(emb, "vec_id", "embedding", queries, "qid", "qv", 1)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quantTop1 = Similarity.quantizedTopK(emb, "vec_id", "embedding", queries, "qid", "qv", k)
      .filter($"rank" === 1)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactTop1 == quantTop1, s"top-1 mismatch: $exactTop1 vs $quantTop1")
  }

  test("cosine near-dup pairs match exact enumeration above threshold") {
    val t = 0.45
    val lsh = Similarity.cosinePairs(emb, "vec_id", "embedding", t,
      bitsPerTable = 4, tables = 16)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = emb.select($"vec_id".as("id"), VectorOps.toDoubleVec($"embedding").as("v"))
    val exact = base.as("x").crossJoin(base.as("y"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id"), col("y.id"),
        VectorOps.cosine(col("x.v"), col("y.v")).as("cos"))
      .filter($"cos" >= t)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH must not produce false positives after exact filter")
    if (exact.nonEmpty) {
      val recall = (exact intersect lsh).size.toDouble / exact.size
      assert(recall >= 0.5, s"cosine-pair recall $recall; exact=${exact.size}")
    }
  }
}
