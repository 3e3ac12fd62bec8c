package graft.sql

import graft.SparkSpec
import graft.ops.{Dedup, IvfPq, Sampling, TextAnalysis, TextIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The SQL/TVF surface (r13): every table function resolves through
  * `spark.sql`, returns the SAME rows as the underlying DataFrame
  * operator, composes with ordinary SQL (filters/joins/aggregates
  * around the TVF body), and the imperative `GraftSql.register` path
  * — the one a notebook or the PySpark wrapper uses — installs the
  * scalar functions too.
  */
class GraftSqlSpec extends SparkSpec {
  import spark.implicits._

  private lazy val registered: Unit = GraftSql.register(spark)

  private lazy val docs =
    graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "lang", "text")

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("graft_exact_dedup TVF == Dedup.exactDedup") {
    registered
    docs.createOrReplaceTempView("sqldocs")
    val tvf = spark.sql(
      "SELECT * FROM graft_exact_dedup('sqldocs', 'doc_id', 'text')")
    assert(rows(tvf) == rows(Dedup.exactDedup(docs, "text", "doc_id")))
  }

  test("graft_gopher_gate TVF == TextAnalysis.gopherFilter, with optional args") {
    registered
    docs.createOrReplaceTempView("sqldocs")
    val tvf = spark.sql(
      "SELECT * FROM graft_gopher_gate('sqldocs', 'doc_id', 'text', 20)")
    assert(rows(tvf) ==
      rows(TextAnalysis.gopherFilter(docs, "doc_id", "text", minTokens = 20)))
  }

  test("graft_minhash_pairs TVF recovers a planted twin") {
    registered
    val base = docs.limit(30).select(col("doc_id").cast("long").as("doc_id"),
      col("text"))
    base.unionAll(base.select((col("doc_id") + 10000000L).as("doc_id"),
        concat(col("text"), lit(" planted near dup")).as("text")))
      .createOrReplaceTempView("sqltwins")
    val got = spark.sql(
      """SELECT count(*) AS n
        |FROM graft_minhash_pairs('sqltwins', 'doc_id', 'text', 3, 32, 16, 0.5)
        |WHERE id_b - id_a = 10000000""".stripMargin).head().getLong(0)
    assert(got >= 27, s"expected ~30 planted pairs, got $got")
  }

  test("graft_dsir_weights TVF == Sampling.dsirWeightsHashed") {
    registered
    docs.createOrReplaceTempView("sqldocs")
    val tvf = spark.sql(
      "SELECT * FROM graft_dsir_weights('sqldocs', 'doc_id', 'text', 'lang = ''en''', 1000)")
    assert(rows(tvf) == rows(Sampling.dsirWeightsHashed(
      docs, "doc_id", "text", expr("lang = 'en'"), 1000)))
  }

  test("graft_bm25 TVF == TextIndex.bm25 against a persisted index") {
    registered
    TextIndex.buildInvertedIndex(docs.limit(100), "doc_id", "text",
      "graft_sql_bm25idx", buckets = 4)
    val term = docs.limit(1).select(split(col("text"), "\\s+").getItem(0))
      .head().getString(0)
    val tvf = spark.sql(s"SELECT * FROM graft_bm25('graft_sql_bm25idx', '$term')")
    assert(rows(tvf) == rows(TextIndex.bm25(spark, "graft_sql_bm25idx", term)))
    assert(tvf.count() > 0)
  }

  test("graft_ivf_topk TVF == IvfPq.topKAgainstIndex") {
    registered
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    IvfPq.buildIndex(emb, "vec_id", "embedding", "graft_sql_ivfidx",
      nCells = 8, m = 8, kCodes = 16, buckets = 4)
    emb.filter($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
      .createOrReplaceTempView("sqlqueries")
    val tvf = spark.sql(
      "SELECT * FROM graft_ivf_topk('graft_sql_ivfidx', 'sqlqueries', 'qid', 'qv', 5, 4)")
    val api = IvfPq.topKAgainstIndex(spark, "graft_sql_ivfidx",
      spark.table("sqlqueries"), "qid", "qv", 5, nprobe = 4)
    assert(rows(tvf) == rows(api))
  }

  test("TVFs compose with surrounding SQL: filter + aggregate over the gate") {
    registered
    docs.createOrReplaceTempView("sqldocs")
    // the synthetic corpus is random token soup, so the FULL keep
    // conjunction is empty here — compose on the token-count rule,
    // which both passes and fails across the fixture
    val kept = spark.sql(
      """SELECT count(*) AS n FROM graft_gopher_gate('sqldocs', 'doc_id', 'text', 20)
        |WHERE r_token_count""".stripMargin).head().getLong(0)
    val api = TextAnalysis.gopherFilter(docs, "doc_id", "text", minTokens = 20)
      .filter(col("r_token_count")).count()
    assert(kept == api && kept > 0)
  }

  test("graft_versioned_read / graft_table_history: time travel from SQL") {
    registered
    import graft.io.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("graft-sql-vt").toString
    VersionedTable.commit(Seq((1L, "a")).toDF("k", "v"), root, "initial")
    VersionedTable.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root)
    assert(spark.sql(s"SELECT * FROM graft_versioned_read('$root')").count() == 2)
    assert(spark.sql(s"SELECT * FROM graft_versioned_read('$root', 1)").count() == 1)
    val hist = spark.sql(
      s"SELECT version, action FROM graft_table_history('$root') ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(hist.toSeq == Seq((1L, "initial"), (2L, "commit")))
  }

  test("scalar functions register through the imperative path too") {
    registered
    assert(spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0) == 11.0)
    val topk = spark.sql(
      """SELECT graft_topk(CAST(id AS DOUBLE), id, 3) AS t
        |FROM range(10)""".stripMargin).head().getSeq[Any](0)
    assert(topk.size == 3)
  }

  test("bad arguments fail with a clear message") {
    registered
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_exact_dedup('nonexistent_view_xyz', 'a', 'b')")
    }
    assert(e.getMessage.contains("nonexistent_view_xyz"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_gopher_gate('sqldocs')").collect()
    }
    assert(e2.getMessage.contains("graft_gopher_gate"))
  }

  test("graft_knn_graph TVF == KnnGraph.nnDescent (deterministic build)") {
    registered
    graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .createOrReplaceTempView("sqlemb")
    val tvf = spark.sql(
      "SELECT * FROM graft_knn_graph('sqlemb', 'vec_id', 'embedding', 4, 2)")
    val api = graft.ops.KnnGraph.nnDescent(
      graft.Tables.embeddings(spark, "/root/testdata/sf0.001"),
      "vec_id", "embedding", 4, iters = 2)
    assert(rows(tvf) == rows(api))
    // composes: SQL aggregates over the TVF body
    val deg = spark.sql(
      """SELECT max(n) FROM (SELECT src, count(*) AS n
        |FROM graft_knn_graph('sqlemb', 'vec_id', 'embedding', 4, 1)
        |GROUP BY src)""".stripMargin).head().getLong(0)
    assert(deg <= 4)
  }

  test("graft_video_dup_pairs TVF == Multimodal pipeline over planted twins") {
    registered
    val base = docs.limit(40).select(col("doc_id"), col("text"))
    base.unionAll(base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text")))
      .createOrReplaceTempView("sqlmedia")
    val tvf = spark.sql(
      "SELECT * FROM graft_video_dup_pairs('sqlmedia', 'doc_id', 'text', 0, 4)")
    val api = GraftJava.videoDupPairs(spark.table("sqlmedia"),
      "doc_id", "text", 0, 4)
    assert(rows(tvf) == rows(api))
    assert(tvf.filter(col("id_b") - col("id_a") === 10000000L).count() ==
      base.filter(col("doc_id") % 10 === 0).count())
  }

  test("graft_mmr_rerank / graft_coverage_select TVFs == their operators") {
    registered
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    emb.createOrReplaceTempView("sqlemb2")
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    graft.ops.Similarity.bruteForceTopKAgg(emb, "vec_id", "embedding",
        queries, "qid", "qv", 10)
      .createOrReplaceTempView("sqltopk")
    val mmrTvf = spark.sql(
      "SELECT * FROM graft_mmr_rerank('sqltopk', 'sqlemb2', 'vec_id', 'embedding', 4, 0.6)")
    val mmrApi = graft.ops.Retrieval.mmrRerank(spark.table("sqltopk"), emb,
      "vec_id", "embedding", 4, 0.6)
    assert(rows(mmrTvf) == rows(mmrApi))
    graft.ops.KnnGraph.bruteKnnGraph(emb.limit(60), "vec_id", "embedding", 4)
      .createOrReplaceTempView("sqlgraph")
    val covTvf = spark.sql(
      "SELECT * FROM graft_coverage_select('sqlgraph', 3)")
    val covApi = graft.ops.KnnGraph.coverageSelect(
      spark.table("sqlgraph"), 3)
    assert(rows(covTvf) == rows(covApi))
  }

  test("graft_quality_margins TVF == fit+score, margins separate the label") {
    registered
    docs.createOrReplaceTempView("sqldocs")
    val tvf = spark.sql(
      """SELECT * FROM graft_quality_margins('sqldocs', 'doc_id', 'text',
        |  'length(text) >= 300', 128, 15, 5.0)""".stripMargin)
    val api = GraftJava.qualityMargins(docs, "doc_id", "text",
      "length(text) >= 300", 128, 15, 5.0)
    assert(rows(tvf) == rows(api))
    val acc = tvf.select(
        ((col("margin") > 0) === (col("y") === 1.0)).cast("int").as("ok"))
      .agg(avg(col("ok"))).head().getDouble(0)
    assert(acc >= 0.8, s"margins should separate the length label, acc=$acc")
  }

  // --- r15: the graph serving/labeling family from pure SQL (the r14
  // --- verdict's #3 gap)

  test("graft_graph_search / graft_graph_search_hier TVFs == KnnGraph operators") {
    registered
    import graft.ops.KnnGraph
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    emb.createOrReplaceTempView("sqlge")
    val graph = KnnGraph.nnDescent(emb, "vec_id", "embedding", 8, iters = 2)
    graph.createOrReplaceTempView("sqlgg")
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    queries.createOrReplaceTempView("sqlgq")
    val flatTvf = spark.sql(
      """SELECT * FROM graft_graph_search('sqlgg', 'sqlge', 'vec_id',
        |  'embedding', 'sqlgq', 'qid', 'qv', 5, 16, 2, 8)""".stripMargin)
    assert(rows(flatTvf) == rows(KnnGraph.graphSearch(graph, emb,
      "vec_id", "embedding", queries, "qid", "qv", 5, 16, 2, 8)))
    val upper = KnnGraph.upperLayerGraph(emb, "vec_id", "embedding", 8,
      iters = 2, layerMod = 4)
    upper.createOrReplaceTempView("sqlgu")
    val hierTvf = spark.sql(
      """SELECT * FROM graft_graph_search_hier('sqlgg', 'sqlgu', 'sqlge',
        |  'vec_id', 'embedding', 'sqlgq', 'qid', 'qv', 5, 16, 2, 8, 2, 4)"""
        .stripMargin)
    assert(rows(hierTvf) == rows(KnnGraph.graphSearchHier(graph, upper, emb,
      "vec_id", "embedding", queries, "qid", "qv", 5, 16, 2, 8, 2, 4)))
  }

  test("graft_label_prop / graft_label_prop_multi TVFs == KnnGraph operators") {
    registered
    import graft.ops.KnnGraph
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val sample = emb.filter(col("vec_id") % 4 === 0)
    val graph = KnnGraph.bruteKnnGraph(sample, "vec_id", "embedding", 6)
    graph.createOrReplaceTempView("sqllpg")
    val seeds = sample.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id"), (col("label") < 5).cast("double").as("s"))
    seeds.createOrReplaceTempView("sqllps")
    assert(rows(spark.sql(
      "SELECT * FROM graft_label_prop('sqllpg', 'sqllps', 'vec_id', 's', 3, 0.8)"))
      == rows(KnnGraph.labelPropagate(graph, seeds, "vec_id", "s", 3, 0.8)))
    val mseeds = sample.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id"), (col("label") % 3).cast("long").as("cls"))
    mseeds.createOrReplaceTempView("sqllpm")
    assert(rows(spark.sql(
      "SELECT * FROM graft_label_prop_multi('sqllpg', 'sqllpm', 'vec_id', 'cls', 3, 0.8)"))
      == rows(KnnGraph.labelPropagateMulti(graph, mseeds, "vec_id", "cls", 3, 0.8)))
  }

  test("graft_graph_topk TVF == GraphIndex.graphSearchHierAgainstIndex") {
    registered
    import graft.ops.GraphIndex
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    GraphIndex.buildGraphIndex(emb, "vec_id", "embedding", "graft_sql_gidx",
      k = 8, layerMod = 4, iters = 2, buckets = 4)
    val queries = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    queries.createOrReplaceTempView("sqlgiq")
    val tvf = spark.sql(
      "SELECT * FROM graft_graph_topk('graft_sql_gidx', 'sqlgiq', 'qid', 'qv', 5, 16, 2, 8, 2, 4)")
    assert(rows(tvf) == rows(GraphIndex.graphSearchHierAgainstIndex(spark,
      "graft_sql_gidx", queries, "qid", "qv", 5, 16, 2, 8, 2, 4)))
  }
}
