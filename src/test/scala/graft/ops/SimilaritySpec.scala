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

  test("semantic contamination: exact dup flags, ties to smallest id, empty corpus safe") {
    val ev = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    // ids 10 and 11 BOTH duplicate eval 1 (tie at cos 1.0 -> nn 10);
    // nothing near eval 2's direction except a 45-degree vector
    val tr = Seq((11L, Array(2.0f, 0.0f)), (10L, Array(3.0f, 0.0f)),
        (12L, Array(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.semanticContamination(
        tr, "vec_id", "embedding", ev, "vec_id", "embedding", tau = 0.99)
      .orderBy("eval_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq === Seq(
      (1L, 1.0, 10L, true), (2L, 0.707107, 12L, false)))

    val empty = tr.filter($"vec_id" < 0)
    val got2 = Similarity.semanticContamination(
        empty, "vec_id", "embedding", ev, "vec_id", "embedding", tau = 0.99)
      .orderBy("eval_id")
      .collect().map(r => (r.getLong(0), r.isNullAt(1), r.isNullAt(2), r.getBoolean(3)))
    assert(got2.toSeq === Seq((1L, true, true, false), (2L, true, true, false)))
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

  test("multi-probe LSH: candidate superset, recall monotone and higher") {
    val k = 10
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", queries, "qid", "qv", k)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(p: Int) = {
      val approx = Similarity.lshTopK(emb, "vec_id", "embedding", queries, "qid", "qv", k,
        bitsPerTable = 4, tables = 16, probes = p)
        .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    val r0 = recallAt(0)
    val r2 = recallAt(2)
    assert(r2 >= r0, s"multi-probe recall $r2 dropped below single-probe $r0")
    assert(r2 >= 0.85, s"multi-probe recall $r2 below expected floor")
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
        // all cells probed + overfetch covering the whole corpus =>
        // the exact float rerank sees every vector => exact
        val viaIdx = Similarity.ivfTopKAgainstIndex(spark, "graft_test_ivf",
          qs, "qid", "qv", k, nprobe = 8, overfetch = 64)
        // REAL post-AQE walk (r15): the former inputPlan-based
        // assertion was vacuous — see graft.PlanChecks
        val shuffledIdx = graft.PlanChecks.directlyShuffledScans(
          viaIdx, "graft_test_ivf")
        assert(shuffledIdx.isEmpty, s"index re-shuffled: $shuffledIdx")
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

  test("int8 index layout: packed binary cells, recall parity at default overfetch") {
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", "graft_test_ivf8",
      nCells = 8, lloydIters = 1, buckets = 4)
    // the hot scan really is the packed-int8 layout: q8 is BINARY
    // (dim bytes per vector), not an array of numbers
    val cellsSchema = spark.table("graft_test_ivf8_cells").schema
    assert(cellsSchema("q8").dataType == org.apache.spark.sql.types.BinaryType)
    assert(!cellsSchema.fieldNames.contains("v"),
      "full vectors must live in _vecs, not the hot cells table")
    val k = 10
    // default overfetch, all cells probed: the int8 stage bounds the
    // rerank set, so results are approximate — but quantization error
    // is tiny, so recall@10 vs float brute force must be high and the
    // top-1 (exact-reranked) must match exactly
    val viaIdx = Similarity.ivfTopKAgainstIndex(spark, "graft_test_ivf8",
      queries, "qid", "qv", k, nprobe = 8)
    val got = viaIdx.select("qid", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queries, "qid", "qv", k)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect got).size.toDouble / exact.size
    assert(recall >= 0.9, s"int8 index recall $recall too low")
    val top1 = viaIdx.filter($"rank" === 1).select("qid", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactTop1 = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queries, "qid", "qv", 1)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(top1 == exactTop1, s"top-1 mismatch: $top1 vs $exactTop1")
  }

  test("appendToIvfIndex: index plus delta serves exactly the rebuilt answer") {
    // build on the first part of the corpus, append the rest as a
    // delta (assigned against the PERSISTED centroids, appended to
    // the bucketed tables); probing all cells with covering overfetch
    // must then be EXACT over the full corpus — and the index side
    // still adds zero exchanges
    val part = emb.filter($"vec_id" < 400)
    val delta = emb.filter($"vec_id" >= 400)
    Similarity.buildIvfIndex(part, "vec_id", "embedding", "graft_test_ivfd",
      nCells = 8, lloydIters = 1, buckets = 4)
    Similarity.appendToIvfIndex(spark, "graft_test_ivfd", delta, "vec_id", "embedding")
    val k = 10
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val viaIdx = Similarity.ivfTopKAgainstIndex(spark, "graft_test_ivfd",
        queries, "qid", "qv", k, nprobe = 8, overfetch = 64)
      // REAL post-AQE walk (r15): the former inputPlan-based assertion
      // was vacuous — see graft.PlanChecks
      val shuffledIdx = graft.PlanChecks.directlyShuffledScans(
        viaIdx, "graft_test_ivfd")
      assert(shuffledIdx.isEmpty, s"index re-shuffled: $shuffledIdx")
      val got = viaIdx.select("qid", "id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
          queries, "qid", "qv", k)
        .select("qid", "id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == exact,
        s"missing=${(exact -- got).take(3)} extra=${(got -- exact).take(3)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    // dimensionality mismatch against the meta table must ERROR, not
    // silently return near-empty results
    val badQ = queries.select($"qid", slice($"qv", 1, 3).as("qv"))
    val err = intercept[IllegalArgumentException] {
      Similarity.ivfTopKAgainstIndex(spark, "graft_test_ivfd", badQ, "qid", "qv", k)
    }
    assert(err.getMessage.contains("dim"))
  }

  test("compactIvfIndex: fewer files, serving results unchanged") {
    // append creates extra files per bucket; compaction must shrink
    // the cells table back to one file per bucket without changing a
    // single served row
    val part = emb.filter($"vec_id" < 400)
    val delta = emb.filter($"vec_id" >= 400)
    Similarity.buildIvfIndex(part, "vec_id", "embedding", "graft_test_ivfc",
      nCells = 8, lloydIters = 1, buckets = 4)
    Similarity.appendToIvfIndex(spark, "graft_test_ivfc", delta, "vec_id", "embedding")
    def serve() = Similarity.ivfTopKAgainstIndex(spark, "graft_test_ivfc",
        queries, "qid", "qv", 10, nprobe = 8, overfetch = 64)
      .select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    def fileCount(table: String): Int = {
      val dir = new java.io.File(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath,
        table.toLowerCase)
      Option(dir.listFiles()).toSeq.flatten
        .count(f => f.isFile && f.getName.endsWith(".parquet"))
    }
    val before = serve()
    val filesBefore = fileCount("graft_test_ivfc_cells")
    assert(filesBefore > 4, s"append produced only $filesBefore files")
    Similarity.compactIvfIndex(spark, "graft_test_ivfc")
    val filesAfter = fileCount("graft_test_ivfc_cells")
    assert(filesAfter <= 4 && filesAfter < filesBefore,
      s"compaction left $filesAfter files (was $filesBefore)")
    assert(before.nonEmpty && serve() == before)
  }

  test("recenterIvfIndex: recall degraded by drifted appends recovers after recluster") {
    // Original corpus: two tight direction-clusters A≈[1,0,..] and
    // B≈[0,1,..]; seeds are ids 0 (in A) and 1 (in B), so the 2-cell
    // k-means is stable. The APPENDED delta is a NEW mode C≈[1,1,..]/√2
    // sitting between the frozen centroids, tilted alternately A-side
    // and B-side — so under frozen centroids C splits across both
    // cells and an nprobe=1 query inside C can only ever see half its
    // true neighbors. That is exactly the drift appendToIvfIndex
    // accepts; recenter must win it back.
    def v(x: Double, y: Double) = Seq(x, y, 0.0, 0.0)
    val clusterA = (0L, v(10, 0)) +: (0 until 20).map(i =>
      (101L + i, v(10 + 0.01 * i, 0.002 * i)))
    val clusterB = (1L, v(0, 10)) +: (0 until 20).map(i =>
      (201L + i, v(0.002 * i, 10 + 0.01 * i)))
    val original = (clusterA ++ clusterB).toDF("id", "v")
    // C: 50 points, epsilon alternates sign (A-side / B-side) and
    // grows in steps, so exact top-k mixes both halves
    val clusterC = (0 until 50).map { i =>
      val eps = (if (i % 2 == 0) 1 else -1) * (0.1 + 0.02 * (i / 2 % 5))
      val id = if (i == 0) 2L else 1000L + i
      (id, v(7 + eps, 7 - eps))
    }
    Similarity.buildIvfIndex(original, "id", "v", "graft_test_recenter",
      nCells = 2, lloydIters = 2, buckets = 4)
    Similarity.appendToIvfIndex(spark, "graft_test_recenter",
      clusterC.toDF("id", "v"), "id", "v")
    val q = Seq(Tuple2(0L, v(7.001, 6.999))).toDF("qid", "qv")
    val current = original.unionAll(clusterC.toDF("id", "v"))
    val exact = Similarity.bruteForceTopK(current, "id", "v",
        q, "qid", "qv", 10)
      .select("id").collect().map(_.getLong(0)).toSet
    def recall(): Int = Similarity.ivfTopKAgainstIndex(
        spark, "graft_test_recenter", q, "qid", "qv",
        10, nprobe = 1, overfetch = 8)
      .select("id").collect().map(_.getLong(0)).toSet
      .intersect(exact).size
    val frozen = recall()
    assert(frozen <= 6,
      s"fixture broken: frozen centroids should split C, recall=$frozen/10")
    // recluster with one more cell (ids 0, 1, 2 seed one per cluster)
    Similarity.recenterIvfIndex(spark, "graft_test_recenter",
      nCells = 3, lloydIters = 3)
    val recovered = recall()
    assert(recovered > frozen && recovered >= 9,
      s"recenter did not recover recall: $frozen -> $recovered")
    // meta reflects the new cell count; serving API unchanged
    assert(spark.table("graft_test_recenter_meta").head().getInt(0) === 3)
    // content sanity: probing every cell after recenter is exact
    val all = Similarity.ivfTopKAgainstIndex(spark, "graft_test_recenter",
        q, "qid", "qv", 10, nprobe = 3, overfetch = 16)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(all === exact, s"missing=${exact -- all} extra=${all -- exact}")
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

  test("marginMine: mutual best-by-margin pairs; a hub is never mined") {
    import org.apache.spark.sql.functions.col
    // x0 <-> y1 and x2 <-> y3 are true pairs; y5 is a HUB sitting at
    // 45 degrees — cosine 0.707 to BOTH x's (higher than any cross
    // cosine), but its margin is negative because it is near
    // everything. Raw-cosine mining would pair it; margin must not.
    val x = Seq((0L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val y = Seq((1L, Seq(1.0f, 0.1f)), (3L, Seq(0.1f, 1.0f)),
      (5L, Seq(0.7f, 0.7f)))
      .toDF("vec_id", "embedding")
    val mined = Similarity.marginMine(x, "vec_id", "embedding",
        y, "vec_id", "embedding", k = 2)
      .orderBy("x_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(mined.map(p => (p._1, p._2)).toSeq === Seq((0L, 1L), (2L, 3L)))
    assert(mined.forall(_._3 > 0.2)) // clear margins for true pairs
    assert(!mined.exists(_._2 == 5L)) // hub excluded despite cos 0.707

    // k larger than the candidate sets must not throw or change pairs
    val wide = Similarity.marginMine(x, "vec_id", "embedding",
        y, "vec_id", "embedding", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wide === Set((0L, 1L), (2L, 3L)))
  }

  test("PRODUCTION bitext: marginFromTopK over per-side persisted IVF k-lists ≡ exact marginMine") {
    // the linear-scale path: each direction's k-lists come from the
    // other side's persisted int8 IVF index (all-cells probe +
    // covering overfetch makes the candidate sets exact, so the
    // composition must reproduce the quadratic reference verbatim)
    val rng = new scala.util.Random(7)
    def vecs(ids: Seq[Long]) = ids.map(i =>
      (i, Seq.fill(8)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val x = vecs(0L until 80L by 2)
    val y = vecs(1L until 80L by 2)
    Similarity.buildIvfIndex(y, "vec_id", "embedding", "graft_bt_y",
      nCells = 2, buckets = 4)
    Similarity.buildIvfIndex(x, "vec_id", "embedding", "graft_bt_x",
      nCells = 2, buckets = 4)
    val fwd = Similarity.ivfTopKAgainstIndex(spark, "graft_bt_y",
      x, "vec_id", "embedding", k = 4, nprobe = 2, overfetch = 16)
    val bwd = Similarity.ivfTopKAgainstIndex(spark, "graft_bt_x",
      y, "vec_id", "embedding", k = 4, nprobe = 2, overfetch = 16)
    val prod = Similarity.marginFromTopK(fwd, bwd, minMargin = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = Similarity.marginMine(x, "vec_id", "embedding",
        y, "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(prod === exact)
    assert(prod.nonEmpty) // the fixture actually mines pairs
  }

  test("metadata-filtered ANN: filtered top-k ≡ brute force on the filtered corpus, filter pushed into the bucketed scan") {
    // serving almost always carries a predicate (lang = 'en', date
    // range): the filter applies to the CELLS scan before the int8
    // dot, so the candidate set IS the filtered top-k (r12)
    val withMeta = emb.withColumn("lang",
      element_at(typedLit(Seq("en", "de", "fr")),
        (pmod($"vec_id", lit(3)) + 1).cast("int")))
    Similarity.buildIvfIndex(withMeta, "vec_id", "embedding",
      "graft_test_ivff", nCells = 8, lloydIters = 1, buckets = 4,
      metaCols = Seq("lang"))
    val k = 10
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val viaIdx = Similarity.ivfTopKAgainstIndex(spark, "graft_test_ivff",
        queries, "qid", "qv", k, nprobe = 8, overfetch = 64,
        filter = Some(col("lang") === "en"))
      // all cells probed + covering overfetch => exact over the
      // lang-filtered corpus
      val got = viaIdx.select("qid", "id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val exact = Similarity.bruteForceTopK(
          withMeta.filter($"lang" === "en"), "vec_id", "embedding",
          queries, "qid", "qv", k)
        .select("qid", "id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == exact,
        s"missing=${(exact -- got).take(3)} extra=${(got -- exact).take(3)}")
      // every survivor really satisfies the predicate
      assert(got.forall { case (_, id, _) => id % 3 == 0 })
      // plan: zero index-side exchanges (REAL post-AQE walk, r15 —
      // the former inputPlan-based assertion was vacuous, see
      // graft.PlanChecks) AND the predicate pushed into the bucketed
      // cells scan
      import org.apache.spark.sql.execution.FileSourceScanExec
      val shuffledIdx = graft.PlanChecks.directlyShuffledScans(
        viaIdx, "graft_test_ivff")
      assert(shuffledIdx.isEmpty, s"index re-shuffled: $shuffledIdx")
      val cellScans = graft.PlanChecks.finalPlanNodes(viaIdx).collect {
        case s: FileSourceScanExec
          if s.tableIdentifier.exists(_.table == "graft_test_ivff_cells") => s
      }
      assert(cellScans.nonEmpty)
      assert(cellScans.forall(_.metadata("PushedFilters").contains("lang")),
        cellScans.map(_.metadata("PushedFilters")).mkString(";"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("metadata columns survive append and recenter; filtered serving stays exact") {
    val withMeta = emb.withColumn("lang",
      element_at(typedLit(Seq("en", "de", "fr")),
        (pmod($"vec_id", lit(3)) + 1).cast("int")))
    Similarity.buildIvfIndex(withMeta.filter($"vec_id" < 400),
      "vec_id", "embedding", "graft_test_ivffa",
      nCells = 8, lloydIters = 1, buckets = 4, metaCols = Seq("lang"))
    // append discovers the index's metadata columns from its schema
    Similarity.appendToIvfIndex(spark, "graft_test_ivffa",
      withMeta.filter($"vec_id" >= 400), "vec_id", "embedding")
    // recenter rewrites _cells from _vecs — metadata must survive
    Similarity.recenterIvfIndex(spark, "graft_test_ivffa", lloydIters = 1)
    assert(spark.table("graft_test_ivffa_cells").columns.contains("lang"))
    val k = 10
    val viaIdx = Similarity.ivfTopKAgainstIndex(spark, "graft_test_ivffa",
      queries, "qid", "qv", k, nprobe = 8, overfetch = 64,
      filter = Some(col("lang") === "de"))
    val got = viaIdx.select("qid", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.bruteForceTopK(
        withMeta.filter($"lang" === "de"), "vec_id", "embedding",
        queries, "qid", "qv", k)
      .select("qid", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exact,
      s"missing=${(exact -- got).take(3)} extra=${(got -- exact).take(3)}")
  }
}
