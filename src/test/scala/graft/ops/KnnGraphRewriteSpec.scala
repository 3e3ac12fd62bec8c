package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r16 optimization guard: the candidate-set rewrites of the descent
  * round and the beam-search hop (one `distinct` over
  * proposals ∪ incumbents instead of distinct + anti-join + carried
  * scores — one exchange fewer per round/hop) must be ROW-IDENTICAL
  * to the pre-r16 anti-join formulation. These specs KEEP the old
  * formulation alive as an inline reference implementation and assert
  * bit-equality of (src, dst, rank, cos) / (qid, id, rank, cos) on a
  * real corpus slice: the equivalence argument ("re-scoring an
  * incumbent reproduces the identical deterministic cosine, and the
  * candidate SET is unchanged") is proved by execution, not prose.
  */
class KnnGraphRewriteSpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")

  private def rows(df: DataFrame): Seq[String] =
    df.select(col(df.columns.head), col(df.columns(1)),
        col(df.columns(2)), round(col(df.columns(3)), 12))
      .collect().map(_.toString).sorted.toSeq

  /** The pre-r16 nnDescent round: proposals distinct, anti-joined
    * against the incumbents, incumbents' scores carried un-rescored.
    */
  private def oldNnDescent(df: DataFrame, idCol: String, vecCol: String,
                           k: Int, iters: Int, initSalts: Int = 4,
                           bucketFactor: Int = 2): DataFrame = {
    val kb = 2 * k
    val c = df.select(col(idCol).cast("long").as("id"),
        VectorOps.toDoubleVec(col(vecCol)).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = c.count()
    val nBuckets = math.max(1L, n / (kb.toLong * bucketFactor))
    def score(pairs: DataFrame): DataFrame =
      pairs
        .join(c.select(col("id").as("src"), col("v").as("va")), "src")
        .join(c.select(col("id").as("dst"), col("v").as("vb")), "dst")
        .select(col("src"), col("dst"),
          VectorOps.cosine(col("va"), col("vb")).as("cos"))
    val initPairs = (0 until initSalts).map { salt =>
      val bkt = c.select(col("id"),
        pmod(xxhash64(col("id"), lit(salt)), lit(nBuckets)).as("bkt"))
      bkt.select(col("bkt"), col("id").as("src"))
        .join(bkt.select(col("bkt"), col("id").as("dst")), "bkt")
        .filter(col("src") =!= col("dst"))
        .select("src", "dst")
    }.reduce(_ unionByName _).distinct()
    var adj = KnnGraph.topKAdj(score(initPairs), kb).localCheckpoint(true)
    var it = 0
    while (it < iters) {
      val und = adj.select(col("src"), col("dst"))
        .unionByName(adj.select(col("dst").as("src"), col("src").as("dst")))
      val proposals = und.as("x").join(und.as("y"), col("x.dst") === col("y.src"))
        .select(col("x.src").as("src"), col("y.dst").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
        .join(adj.select("src", "dst"), Seq("src", "dst"), "left_anti")
      val merged = score(proposals)
        .unionByName(adj.select("src", "dst", "cos"))
      adj = KnnGraph.topKAdj(merged, kb).localCheckpoint(true)
      it += 1
    }
    c.unpersist()
    adj.filter(col("rank") <= k)
  }

  /** The pre-r16 beam hop: expansion distinct, anti-joined against
    * the beam, the beam's scores carried un-rescored.
    */
  private def oldGraphSearch(graph: DataFrame, corpus: DataFrame,
                             idCol: String, vecCol: String,
                             queries: DataFrame, qIdCol: String,
                             qVecCol: String, k: Int, beam: Int,
                             hops: Int, seedMod: Int): DataFrame = {
    val c = corpus.select(col(idCol).cast("long").as("id"),
        VectorOps.toDoubleVec(col(vecCol)).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = queries.select(col(qIdCol).cast("long").as("qid"),
        VectorOps.toDoubleVec(col(qVecCol)).as("qv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val und = KnnGraph.undirected(graph)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seeds = c.filter(pmod(xxhash64(col("id")), lit(seedMod)) === 0)
      .select(col("id"))
    def scoreIds(cand: DataFrame): DataFrame =
      cand.join(c, "id").join(q, "qid")
        .select(col("qid"), col("id"),
          VectorOps.cosine(col("qv"), col("v")).as("cos"))
    def topBeam(scored: DataFrame, b: Int): DataFrame =
      scored.groupBy("qid")
        .agg(graft.functions.Native.topKPairs(col("cos"), col("id"), b).as("top"))
        .select(col("qid"), posexplode(col("top")).as(Seq("r", "pair")))
        .select(col("qid"), col("pair.id").as("id"),
          (col("r") + 1).cast("int").as("rank"), col("pair.score").as("cos"))
    var best = topBeam(
      scoreIds(q.select("qid").crossJoin(broadcast(seeds))), beam)
      .localCheckpoint(true)
    var hop = 0
    while (hop < hops) {
      val expanded = best.select("qid", "id")
        .join(und, best("id") === und("src"))
        .select(col("qid"), col("dst").as("id"))
        .distinct()
        .join(best.select("qid", "id"), Seq("qid", "id"), "left_anti")
      best = topBeam(
        scoreIds(expanded).unionByName(best.select("qid", "id", "cos")), beam)
        .localCheckpoint(true)
      hop += 1
    }
    und.unpersist(); c.unpersist(); q.unpersist()
    best.filter(col("rank") <= k)
  }

  test("r16 nnDescent candidate-set rewrite ≡ the anti-join formulation") {
    val now = KnnGraph.nnDescent(emb, "vec_id", "embedding", 4, iters = 2)
    val ref = oldNnDescent(emb, "vec_id", "embedding", 4, iters = 2)
    assert(rows(now) == rows(ref))
  }

  test("r16 beam-hop candidate-set rewrite ≡ the anti-join formulation") {
    val graph = KnnGraph.nnDescent(emb, "vec_id", "embedding", 8, iters = 2)
      .localCheckpoint(true)
    val queries = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val now = KnnGraph.graphSearch(graph, emb, "vec_id", "embedding",
      queries, "qid", "qv", k = 5, beam = 16, hops = 3, seedMod = 8)
    val ref = oldGraphSearch(graph, emb, "vec_id", "embedding",
      queries, "qid", "qv", k = 5, beam = 16, hops = 3, seedMod = 8)
    assert(rows(now) == rows(ref))
  }
}
