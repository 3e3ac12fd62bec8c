"""Thin PySpark wrapper for the graft Spark-native curation library.

The Scala library does all the work; this module only routes PySpark
DataFrames through the py4j gateway to the library's Java-friendly
facade (``graft.sql.GraftJava``) and re-wraps the results. Ship the
graft jar on the session classpath, e.g.::

    spark = (SparkSession.builder
        .config("spark.jars", "target/scala-2.13/graft_2.13-0.1.0.jar")
        .getOrCreate())

    import graft
    graft.register_sql(spark)          # SQL surface: graft_* functions + TVFs
    spark.sql("SELECT * FROM graft_gopher_gate('docs', 'doc_id', 'text')")

    survivors = graft.exact_dedup(docs, "doc_id", "text")   # DataFrame API
"""

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "register_sql",
    "exact_dedup",
    "gopher_filter",
    "minhash_pairs",
    "dsir_weights_hashed",
    "bm25",
    "ivf_topk",
    "versioned_commit",
    "versioned_read",
    "table_history",
    "knn_graph",
    "graph_search",
    "video_dup_pairs",
    "video_metadata",
    "quality_margins",
    "mmr_rerank",
    "coverage_select",
    "sem_dedup",
    "isotonic_calibrate",
    "bpe_encode_bytes",
    "snapshot_diff",
    "snapshot_diff_summary",
    "k_anonymity",
    "label_propagate_multi",
    "versioned_commit_concurrent",
    "audio_dup_pairs",
    "image_dup_pairs",
    "upper_layer_graph",
    "graph_search_hier",
    "build_graph_index",
    "graph_topk",
    "add_to_graph_index",
    "compact_graph_index",
    "redescent_graph_index",
]


def _java(spark: SparkSession):
    return spark._jvm.graft.sql.GraftJava


def _wrap(spark: SparkSession, jdf) -> DataFrame:
    return DataFrame(jdf, spark)


def register_sql(spark: SparkSession) -> None:
    """Register every graft SQL function and table function on this
    session (idempotent). After this, ``spark.sql`` resolves
    ``graft_dot`` / ``graft_topk`` / ... and the table functions
    ``graft_exact_dedup`` / ``graft_gopher_gate`` /
    ``graft_minhash_pairs`` / ``graft_dsir_weights`` / ``graft_bm25``
    / ``graft_ivf_topk``.

    Also sets ``spark.sql.requireAllClusterKeysForCoPartition=false``
    (a runtime SQL conf): the persisted index tables are bucketed on
    one key while some probe joins carry extra equi-keys, and Spark's
    default (true) silently reshuffles the bucketed index side on
    every such probe — every graft JVM entry point pins this, and a
    user-built PySpark session must match or the exchange-free index
    contract is lost (see README).
    """
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    _java(spark).register(spark._jsparkSession)


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per distinct content: (content_key, keep_id, n_copies);
    keep_id is the minimum id of the content group."""
    return _wrap(df.sparkSession, _java(df.sparkSession)
                 .exactDedup(df._jdf, id_col, text_col))


def gopher_filter(df: DataFrame, id_col: str, text_col: str,
                  min_tokens: int = 50, max_tokens: int = 100000) -> DataFrame:
    """Per-doc Gopher quality gate: (doc_id, r_<rule>..., keep)."""
    return _wrap(df.sparkSession, _java(df.sparkSession)
                 .gopherFilter(df._jdf, id_col, text_col, min_tokens, max_tokens))


def minhash_pairs(df: DataFrame, id_col: str, text_col: str,
                  shingle_n: int = 1, k: int = 32, bands: int = 16,
                  threshold: float = 0.9) -> DataFrame:
    """Banded MinHash/LSH near-duplicate pairs: (id_a, id_b, est_jaccard)."""
    return _wrap(df.sparkSession, _java(df.sparkSession)
                 .minhashPairs(df._jdf, id_col, text_col,
                               shingle_n, k, bands, threshold))


def dsir_weights_hashed(df: DataFrame, id_col: str, text_col: str,
                        target_predicate_sql: str,
                        buckets: int = 10000) -> DataFrame:
    """Hashed-bucket DSIR importance weights: (doc_id, lw, n_bigrams).
    The target LM trains on rows matching the boolean SQL predicate."""
    return _wrap(df.sparkSession, _java(df.sparkSession)
                 .dsirWeightsHashed(df._jdf, id_col, text_col,
                                    target_predicate_sql, buckets))


def bm25(spark: SparkSession, index_name: str, query: str,
         k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Okapi BM25 ranked retrieval against a persisted graft text
    index: (doc_id, score)."""
    return _wrap(spark, _java(spark)
                 .bm25(spark._jsparkSession, index_name, query, k1, b))


def ivf_topk(spark: SparkSession, index_name: str, queries: DataFrame,
             qid_col: str, qvec_col: str, k: int, nprobe: int = 4) -> DataFrame:
    """ANN top-k of every query row against a persisted graft IVF-PQ
    index: (qid, id, rank, cos)."""
    return _wrap(spark, _java(spark)
                 .ivfTopK(spark._jsparkSession, index_name, queries._jdf,
                          qid_col, qvec_col, k, nprobe))


def versioned_commit(df: DataFrame, root: str, action: str = "commit") -> int:
    """Commit df as the next version of a snapshot-isolated graft
    VersionedTable at `root`; returns the new version number."""
    return _java(df.sparkSession).versionedCommit(df._jdf, root, action)


def versioned_read(spark: SparkSession, root: str,
                   version: int = None) -> DataFrame:
    """Read a graft VersionedTable at its current (or the given)
    version — snapshot-isolated time travel."""
    v = -1 if version is None else int(version)
    return _wrap(spark, _java(spark)
                 .versionedRead(spark._jsparkSession, root, v))


def table_history(spark: SparkSession, root: str) -> DataFrame:
    """A graft VersionedTable's commit log:
    (version, data_dir, n_rows, action)."""
    return _wrap(spark, _java(spark)
                 .tableHistory(spark._jsparkSession, root))


def knn_graph(df: DataFrame, id_col: str, vec_col: str, k: int,
              iters: int = 4) -> DataFrame:
    """Approximate kNN graph via NN-Descent (eager iterative build):
    (src, dst, rank, cos)."""
    return _wrap(df.sparkSession, _java(df.sparkSession)
                 .knnGraph(df._jdf, id_col, vec_col, k, iters))


def graph_search(graph: DataFrame, corpus: DataFrame, id_col: str,
                 vec_col: str, queries: DataFrame, qid_col: str,
                 qvec_col: str, k: int, beam: int = 32, hops: int = 3,
                 seed_mod: int = 16) -> DataFrame:
    """Beam search over a built kNN graph (the batch HNSW serving
    loop): (qid, id, rank, cos)."""
    return _wrap(corpus.sparkSession, _java(corpus.sparkSession)
                 .graphSearch(graph._jdf, corpus._jdf, id_col, vec_col,
                              queries._jdf, qid_col, qvec_col,
                              k, beam, hops, seed_mod))


def video_dup_pairs(df: DataFrame, id_col: str, payload_col: str,
                    max_hamming: int = 4, bands: int = 8) -> DataFrame:
    """Perceptual near-duplicate media pairs over an opaque payload
    column (real decode for Y4M/animated-GIF): (id_a, id_b, hamming)."""
    return _wrap(df.sparkSession, _java(df.sparkSession)
                 .videoDupPairs(df._jdf, id_col, payload_col,
                                max_hamming, bands))


def quality_margins(df: DataFrame, id_col: str, text_col: str,
                    label_predicate_sql: str, buckets: int = 512,
                    iters: int = 25, lr: float = 5.0) -> DataFrame:
    """Fit the hashed-LR quality classifier against a boolean label
    predicate (eager gradient-descent fit) and score every row:
    (doc_id, y, margin); margin > 0 means predicted positive."""
    return _wrap(df.sparkSession, _java(df.sparkSession)
                 .qualityMargins(df._jdf, id_col, text_col,
                                 label_predicate_sql, buckets, iters, lr))


def mmr_rerank(topk: DataFrame, corpus: DataFrame, id_col: str,
               vec_col: str, k_out: int, lam: float = 0.7) -> DataFrame:
    """MMR diversity re-ranking of a (qid, id, cos) top-k table:
    (qid, id, mmr_rank, mmr_score)."""
    return _wrap(corpus.sparkSession, _java(corpus.sparkSession)
                 .mmrRerank(topk._jdf, corpus._jdf, id_col, vec_col,
                            k_out, lam))


def coverage_select(graph: DataFrame, k_out: int) -> DataFrame:
    """Greedy max-coverage subset selection over a (src, dst) kNN
    graph (eager driver-loop greedy): (id, pick_rank, gain)."""
    return _wrap(graph.sparkSession, _java(graph.sparkSession)
                 .coverageSelect(graph._jdf, k_out))


def video_metadata(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Header-only video metadata (Y4M + animated GIF): (media_id,
    is_video, container, width, height, fps_num, fps_den, n_frames)."""
    return _wrap(df.sparkSession, _java(df.sparkSession)
                 .videoMetadata(df._jdf, id_col, payload_col))


def sem_dedup(df: DataFrame, id_col: str, vec_col: str, threshold: float,
              n_cells: int = 16, lloyd_iters: int = 2) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) over an embedding column: cluster,
    pair within cells at cosine >= threshold, keep one survivor per
    semantic group: (id, sem_group, kept)."""
    return _wrap(df.sparkSession, _java(df.sparkSession)
                 .semDedup(df._jdf, id_col, vec_col, threshold,
                           n_cells, lloyd_iters))


def isotonic_calibrate(df: DataFrame, label_col: str, prob_col: str,
                       out_col: str = "p_cal") -> DataFrame:
    """Fit isotonic (PAV) recalibration of prob_col against the 0/1
    label_col and return df plus the calibrated column (a codegen'd
    step function, no UDF)."""
    return _wrap(df.sparkSession, _java(df.sparkSession)
                 .isotonicCalibrate(df._jdf, label_col, prob_col, out_col))


def bpe_encode_bytes(df: DataFrame, id_col: str, text_col: str,
                     num_merges: int = 256,
                     max_words: int = 65536) -> DataFrame:
    """Train a byte-level (GPT-2-style) BPE on text_col and encode
    every row: (doc_id, ids array<int>, n_tokens)."""
    return _wrap(df.sparkSession, _java(df.sparkSession)
                 .bpeEncodeBytes(df._jdf, id_col, text_col,
                                 num_merges, max_words))


def snapshot_diff(old: DataFrame, cur: DataFrame, key: str,
                  compare_cols) -> DataFrame:
    """Row-level snapshot diff by content hash: (key, status) with
    status in added/removed/changed/unchanged."""
    return _wrap(cur.sparkSession, _java(cur.sparkSession)
                 .snapshotDiff(old._jdf, cur._jdf, key, list(compare_cols)))


def snapshot_diff_summary(old: DataFrame, cur: DataFrame, key: str,
                          compare_cols) -> DataFrame:
    """Aggregated snapshot diff: (status, n) — the promotion-gate
    number."""
    return _wrap(cur.sparkSession, _java(cur.sparkSession)
                 .snapshotDiffSummary(old._jdf, cur._jdf, key,
                                      list(compare_cols)))


def k_anonymity(df: DataFrame, qi_cols, k: int) -> DataFrame:
    """k-anonymity audit over quasi-identifier columns:
    (qi..., n, at_risk)."""
    return _wrap(df.sparkSession, _java(df.sparkSession)
                 .kAnonymity(df._jdf, list(qi_cols), int(k)))


def label_propagate_multi(graph: DataFrame, seeds: DataFrame, id_col: str,
                          class_col: str, iters: int = 3,
                          alpha: float = 0.8) -> DataFrame:
    """Multi-class graph label spreading (Zhou et al. 2003) over a
    (src, dst, cos) kNN graph from (id, class) seeds:
    (id, label, score, seeded)."""
    return _wrap(graph.sparkSession, _java(graph.sparkSession)
                 .labelPropagateMulti(graph._jdf, seeds._jdf, id_col,
                                      class_col, iters, alpha))


def versioned_commit_concurrent(df: DataFrame, root: str,
                                action: str = "commit") -> int:
    """Multi-writer commit to a graft VersionedTable: optimistic
    concurrency, atomic manifest publish, retry-next-version on a
    lost race; returns the committed version."""
    return _java(df.sparkSession).versionedCommitConcurrent(
        df._jdf, root, action)


def audio_dup_pairs(df: DataFrame, id_col: str, payload_col: str,
                    max_hamming: int = 4, bands: int = 8) -> DataFrame:
    """Perceptual near-duplicate AUDIO pairs (real WAV decode,
    band-energy fingerprint): (id_a, id_b, hamming)."""
    return _wrap(df.sparkSession, _java(df.sparkSession)
                 .audioDupPairs(df._jdf, id_col, payload_col,
                                max_hamming, bands))


def image_dup_pairs(df: DataFrame, id_col: str, payload_col: str,
                    max_hamming: int = 10, bands: int = 16) -> DataFrame:
    """Perceptual near-duplicate IMAGE pairs (real PNG/JPEG/GIF/BMP
    decode, dHash): (id_a, id_b, hamming)."""
    return _wrap(df.sparkSession, _java(df.sparkSession)
                 .imageDupPairs(df._jdf, id_col, payload_col,
                                max_hamming, bands))


def upper_layer_graph(df: DataFrame, id_col: str, vec_col: str, k: int,
                      iters: int = 4, layer_mod: int = 16) -> DataFrame:
    """The hash-promoted UPPER layer of a two-layer hierarchical kNN
    graph (HNSW layer rule, stateless): NN-Descent over the
    xxhash64(id) % layer_mod == 0 sample."""
    return _wrap(df.sparkSession, _java(df.sparkSession)
                 .upperLayerGraph(df._jdf, id_col, vec_col, k, iters,
                                  layer_mod))


def graph_search_hier(graph: DataFrame, upper_graph: DataFrame,
                      corpus: DataFrame, id_col: str, vec_col: str,
                      queries: DataFrame, qid_col: str, qvec_col: str,
                      k: int, beam: int = 32, hops: int = 2,
                      entry_beam: int = 8, upper_hops: int = 2,
                      seed_mod: int = 4) -> DataFrame:
    """Hierarchical graph-ANN serving: beam-search the small upper
    layer first, then seed the base layer from each query's best
    upper results: (qid, id, rank, cos)."""
    return _wrap(corpus.sparkSession, _java(corpus.sparkSession)
                 .graphSearchHier(graph._jdf, upper_graph._jdf, corpus._jdf,
                                  id_col, vec_col, queries._jdf, qid_col,
                                  qvec_col, k, beam, hops, entry_beam,
                                  upper_hops, seed_mod))


def build_graph_index(df: DataFrame, id_col: str, vec_col: str, name: str,
                      k: int = 8, layer_mod: int = 16, iters: int = 4,
                      buckets: int = 32) -> None:
    """Build and PERSIST a two-layer graph-ANN index (base + HNSW-style
    upper layer) as write-once bucketed tables — the graph-family
    mirror of the IVF index lifecycle."""
    _java(df.sparkSession).buildGraphIndex(df._jdf, id_col, vec_col, name,
                                           k, layer_mod, iters, buckets)


def graph_topk(spark: SparkSession, name: str, queries: DataFrame,
               qid_col: str, qvec_col: str, k: int, beam: int = 32,
               hops: int = 2, entry_beam: int = 8, upper_hops: int = 2,
               seed_mod: int = 4) -> DataFrame:
    """Hierarchical ANN top-k against a PERSISTED graph index — no
    rebuild: (qid, id, rank, cos)."""
    return _wrap(spark, _java(spark).graphTopK(spark._jsparkSession, name,
                                               queries._jdf, qid_col,
                                               qvec_col, k, beam, hops,
                                               entry_beam, upper_hops,
                                               seed_mod))


def add_to_graph_index(spark: SparkSession, name: str, delta: DataFrame,
                       id_col: str, vec_col: str) -> None:
    """Fold a delta batch of vectors into a persisted graph index:
    append-only overlay writes, O(delta·k + touched·k), history never
    rewritten."""
    _java(spark).addToGraphIndex(spark._jsparkSession, name, delta._jdf,
                                 id_col, vec_col)


def compact_graph_index(spark: SparkSession, name: str) -> None:
    """Fold the index's overlays into its base tables (served rows
    preserved bit-exactly) and compact the vector table's files."""
    _java(spark).compactGraphIndex(spark._jsparkSession, name)


def redescent_graph_index(spark: SparkSession, name: str,
                          iters: int = 4) -> None:
    """Full NN-Descent rebuild of both layers from the index's current
    vectors — the quality-restoring maintenance step."""
    _java(spark).redescentGraphIndex(spark._jsparkSession, name, iters)
