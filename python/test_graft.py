"""Smoke test for the PySpark wrapper (python/graft.py).

Run from the repo root after `sbt package`:

    python3 -m pytest python/test_graft.py -q
or
    python3 python/test_graft.py        # plain-assert fallback runner

Uses the driver-generated testdata at /root/testdata/sf0.001.
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

from pyspark.sql import SparkSession

import graft

TESTDATA = os.environ.get("GRAFT_TESTDATA", "/root/testdata/sf0.001")


def _jar():
    pattern = os.path.join(os.path.dirname(__file__), "..",
                           "target", "scala-2.13", "*.jar")
    cands = sorted(p for p in glob.glob(pattern)
                   if "sources" not in p and "javadoc" not in p)
    assert cands, "run `sbt package` first: no library jar under target/scala-2.13"
    return os.path.abspath(cands[-1])


_spark = None


def spark_session():
    global _spark
    if _spark is None:
        _spark = (SparkSession.builder
                  .master("local[4]")
                  .appName("graft-python-smoke")
                  .config("spark.jars", _jar())
                  .config("spark.sql.shuffle.partitions", "4")
                  .config("spark.sql.ansi.enabled", "true")
                  .config("spark.ui.enabled", "false")
                  .getOrCreate())
        _spark.sparkContext.setLogLevel("WARN")
    return _spark


def docs(spark):
    return spark.read.parquet(os.path.join(TESTDATA, "documents.parquet"))


def test_exact_dedup_matches_sql_groupby():
    spark = spark_session()
    d = docs(spark)
    got = graft.exact_dedup(d, "doc_id", "text")
    assert got.columns == ["content_key", "keep_id", "n_copies"]
    expected = d.groupBy("text").count().count()
    assert got.count() == expected


def test_gopher_filter_shape_and_gate():
    spark = spark_session()
    gated = graft.gopher_filter(docs(spark), "doc_id", "text", min_tokens=20)
    assert "keep" in gated.columns and "doc_id" in gated.columns
    n = gated.count()
    # the synthetic corpus is random token soup: the full keep
    # conjunction is empty, but the structural token-count rule
    # passes and fails across the fixture
    kept = gated.filter("r_token_count").count()
    assert 0 < kept <= n


def test_register_sql_drives_tvfs_and_scalars():
    spark = spark_session()
    graft.register_sql(spark)
    docs(spark).createOrReplaceTempView("pydocs")
    # table function == wrapper result
    tvf = spark.sql(
        "SELECT * FROM graft_exact_dedup('pydocs', 'doc_id', 'text')")
    api = graft.exact_dedup(docs(spark), "doc_id", "text")
    assert tvf.count() == api.count()
    # scalar function
    row = spark.sql(
        "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head()
    assert row.d == 11.0


def test_minhash_pairs_recovers_planted_twin():
    spark = spark_session()
    d = docs(spark).select("doc_id", "text").limit(50)
    twins = d.selectExpr("doc_id + 10000000 AS doc_id",
                         "concat(text, ' planted near dup') AS text")
    pairs = graft.minhash_pairs(d.unionAll(twins), "doc_id", "text",
                                shingle_n=3, k=32, bands=16, threshold=0.5)
    # every planted twin is a (id, id+10M) pair candidate
    hit = pairs.filter("id_b - id_a = 10000000").count()
    assert hit >= 45, f"expected ~50 planted pairs, got {hit}"


def test_versioned_table_time_travel():
    import tempfile
    spark = spark_session()
    root = tempfile.mkdtemp(prefix="graft-py-vt")
    d1 = spark.createDataFrame([(1, "a")], "k INT, v STRING")
    d2 = spark.createDataFrame([(1, "a"), (2, "b")], "k INT, v STRING")
    assert graft.versioned_commit(d1, root, "initial") == 1
    assert graft.versioned_commit(d2, root) == 2
    assert graft.versioned_read(spark, root).count() == 2
    assert graft.versioned_read(spark, root, version=1).count() == 1
    hist = graft.table_history(spark, root).orderBy("version").collect()
    assert [(r.version, r.action) for r in hist] == [(1, "initial"), (2, "commit")]
    # and from SQL
    graft.register_sql(spark)
    assert spark.sql(
        f"SELECT * FROM graft_versioned_read('{root}', 1)").count() == 1


def test_dsir_weights_hashed_runs():
    spark = spark_session()
    w = graft.dsir_weights_hashed(docs(spark), "doc_id", "text",
                                  "lang = 'en'", buckets=1000)
    assert set(["doc_id", "lw", "n_bigrams"]).issubset(set(w.columns))
    assert w.count() == docs(spark).count()


def test_knn_graph_and_graph_search():
    spark = spark_session()
    emb = spark.read.parquet(os.path.join(TESTDATA, "embeddings.parquet"))
    g = graft.knn_graph(emb, "vec_id", "embedding", k=4, iters=2)
    assert g.columns == ["src", "dst", "rank", "cos"]
    assert g.groupBy("src").count().agg({"count": "max"}).head()[0] <= 4
    q = emb.filter("vec_id < 3").selectExpr("vec_id AS qid",
                                            "embedding AS qv")
    # all-seeds config is exact: the top hit of each query is itself
    served = graft.graph_search(g, emb, "vec_id", "embedding",
                                q, "qid", "qv", k=3, beam=8, hops=0,
                                seed_mod=1)
    top1 = {(r.qid, r.id) for r in served.filter("rank = 1").collect()}
    assert top1 == {(0, 0), (1, 1), (2, 2)}


def test_video_dup_pairs_fnv_fallback_and_sql_tvf():
    spark = spark_session()
    d = docs(spark).select("doc_id", "text").limit(40)
    planted = d.filter("doc_id % 10 = 0").selectExpr(
        "doc_id + 10000000 AS doc_id", "text")
    corpus = d.unionAll(planted)
    pairs = graft.video_dup_pairs(corpus, "doc_id", "text",
                                  max_hamming=0, bands=4)
    assert pairs.filter("id_b - id_a = 10000000").count() == \
        d.filter("doc_id % 10 = 0").count()
    graft.register_sql(spark)
    corpus.createOrReplaceTempView("pymedia")
    tvf = spark.sql("SELECT * FROM graft_video_dup_pairs("
                    "'pymedia', 'doc_id', 'text', 0, 4)")
    assert tvf.count() == pairs.count()


def test_quality_margins_separates_label():
    spark = spark_session()
    m = graft.quality_margins(docs(spark), "doc_id", "text",
                              "length(text) >= 300", buckets=128,
                              iters=15, lr=5.0)
    assert set(["doc_id", "y", "margin"]).issubset(set(m.columns))
    acc = m.selectExpr(
        "avg(CAST((margin > 0) = (y = 1.0) AS INT)) AS a").head().a
    assert acc >= 0.8, f"train accuracy {acc} too low"


def test_mmr_coverage_video_metadata_wrappers():
    spark = spark_session()
    emb = spark.read.parquet(os.path.join(TESTDATA, "embeddings.parquet"))
    q = emb.filter("vec_id < 2").selectExpr("vec_id AS qid",
                                            "embedding AS qv")
    g = graft.knn_graph(emb.limit(80), "vec_id", "embedding", k=4, iters=1)
    topk = graft.graph_search(g, emb, "vec_id", "embedding", q, "qid", "qv",
                              k=8, beam=16, hops=1, seed_mod=4)
    mmr = graft.mmr_rerank(topk, emb, "vec_id", "embedding", k_out=3)
    assert mmr.columns == ["qid", "id", "mmr_rank", "mmr_score"]
    assert mmr.count() == 2 * 3
    cov = graft.coverage_select(g, 3)
    assert cov.columns == ["id", "pick_rank", "gain"]
    assert cov.count() == 3
    vm = graft.video_metadata(docs(spark).limit(10), "doc_id", "text")
    assert vm.filter("is_video").count() == 0  # text payloads
    assert vm.count() == 10


def test_sem_dedup_and_isotonic_and_bpe():
    spark = spark_session()
    emb = spark.read.parquet(os.path.join(TESTDATA, "embeddings.parquet"))
    sd = graft.sem_dedup(emb.limit(100), "vec_id", "embedding",
                         threshold=0.99, n_cells=4, lloyd_iters=1)
    assert sd.columns == ["id", "sem_group", "kept"]
    assert sd.count() == 100
    assert sd.filter("kept").count() >= 1
    d = docs(spark).selectExpr(
        "doc_id", "CAST(length(text) >= 300 AS INT) AS y",
        "round(least(length(text) / 1000.0, 1.0), 3) AS p")
    cal = graft.isotonic_calibrate(d, "y", "p", "p_cal")
    assert "p_cal" in cal.columns
    # calibrated probabilities are monotone in the raw score
    rows = (cal.select("p", "p_cal").distinct().orderBy("p")
            .collect())
    assert all(a.p_cal <= b.p_cal + 1e-12 for a, b in zip(rows, rows[1:]))
    ids = graft.bpe_encode_bytes(docs(spark).limit(50), "doc_id", "text",
                                 num_merges=64, max_words=4096)
    assert ids.columns == ["doc_id", "ids", "n_tokens"]
    assert ids.filter("n_tokens > 0").count() > 0


def test_snapshot_diff_and_k_anonymity():
    spark = spark_session()
    d = docs(spark).select("doc_id", "text")
    old = d.filter("doc_id % 2 = 0")
    cur = d.filter("doc_id % 3 = 0")
    summ = {r.status: r.n for r in
            graft.snapshot_diff_summary(old, cur, "doc_id", ["text"])
            .collect()}
    n_old = old.count(); n_cur = cur.count()
    both = d.filter("doc_id % 6 = 0").count()
    assert summ.get("removed", 0) == n_old - both
    assert summ.get("added", 0) == n_cur - both
    assert summ.get("unchanged", 0) == both
    ka = graft.k_anonymity(
        docs(spark).selectExpr("lang", "source"), ["lang", "source"], 5)
    assert set(["lang", "source", "n", "at_risk"]) == set(ka.columns)


def test_label_propagate_multi_and_concurrent_commit(tmp_path=None):
    spark = spark_session()
    emb = spark.read.parquet(os.path.join(TESTDATA, "embeddings.parquet"))
    sample = emb.filter("vec_id % 4 = 0")
    g = graft.knn_graph(sample, "vec_id", "embedding", k=4, iters=1)
    seeds = sample.filter("vec_id % 20 = 0").selectExpr(
        "vec_id", "CAST(label % 3 AS BIGINT) AS cls")
    lp = graft.label_propagate_multi(g, seeds, "vec_id", "cls", iters=2)
    assert lp.columns == ["id", "label", "score", "seeded"]
    assert lp.count() > 0
    labels = set(r.label for r in lp.select("label").distinct().collect())
    assert labels.issubset({0, 1, 2})
    import tempfile
    root = tempfile.mkdtemp(prefix="graft-vt-py")
    v1 = graft.versioned_commit_concurrent(docs(spark).limit(5), root, "w1")
    v2 = graft.versioned_commit_concurrent(docs(spark).limit(7), root, "w2")
    assert (v1, v2) == (1, 2)
    assert graft.versioned_read(spark, root).count() == 7
    assert graft.versioned_read(spark, root, 1).count() == 5


def test_media_dup_pair_wrappers():
    spark = spark_session()
    d = docs(spark).limit(200).select("doc_id", "text")
    twin = d.filter("doc_id % 50 = 0").selectExpr(
        "doc_id + 1000000 AS doc_id", "text")
    corpus = d.union(twin)
    for fn in (graft.image_dup_pairs, graft.audio_dup_pairs,
               graft.video_dup_pairs):
        pairs = fn(corpus, "doc_id", "text", 0, 4)
        assert pairs.columns == ["id_a", "id_b", "hamming"]
        # every planted byte-identical twin pairs at hamming 0
        assert pairs.filter("hamming = 0").count() >= twin.count()


def test_graph_index_lifecycle_wrappers():
    spark = spark_session()
    emb = spark.read.parquet(os.path.join(TESTDATA, "embeddings.parquet"))
    base = emb.filter("vec_id % 5 != 0")
    delta = emb.filter("vec_id % 5 = 0")
    graft.build_graph_index(base, "vec_id", "embedding", "graft_py_gidx",
                            k=4, layer_mod=4, iters=1, buckets=4)
    q = emb.filter("vec_id < 2").selectExpr("vec_id AS qid",
                                            "embedding AS qv")
    served = graft.graph_topk(spark, "graft_py_gidx", q, "qid", "qv",
                              k=3, beam=8, hops=1)
    assert served.columns == ["qid", "id", "rank", "cos"]
    assert served.count() == 2 * 3
    graft.add_to_graph_index(spark, "graft_py_gidx", delta,
                             "vec_id", "embedding")
    # the folded index now serves delta ids too
    served2 = graft.graph_topk(spark, "graft_py_gidx", q, "qid", "qv",
                               k=3, beam=8, hops=1)
    assert served2.count() == 2 * 3
    graft.compact_graph_index(spark, "graft_py_gidx")
    assert spark.table("graft_py_gidx_adj_delta").count() == 0
    graft.redescent_graph_index(spark, "graft_py_gidx", iters=1)
    assert graft.graph_topk(spark, "graft_py_gidx", q, "qid", "qv",
                            k=3, beam=8, hops=1).count() == 2 * 3
    # and the probe TVF reaches the same index from pure SQL
    graft.register_sql(spark)
    q.createOrReplaceTempView("py_gidx_q")
    assert spark.sql(
        "SELECT * FROM graft_graph_topk('graft_py_gidx', 'py_gidx_q', "
        "'qid', 'qv', 3, 8, 1)").count() == 2 * 3


if __name__ == "__main__":
    for name, fn in sorted(globals().items()):
        if name.startswith("test_") and callable(fn):
            fn()
            print(f"PASS {name}")
    print("all python smoke tests passed")
