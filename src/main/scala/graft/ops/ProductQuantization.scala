package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization for billion-scale ANN (Jégou, Douze & Schmid
  * 2011, "Product quantization for nearest neighbor search") — the
  * compression step past int8: the vector splits into `m` subspaces,
  * each quantized to one of `k` codebook centroids, so a d-dim
  * float64 vector stores as m small ints (d=64, m=8, k=16 → 64×).
  * Query-side ADC (asymmetric distance computation) scores a code
  * WITHOUT decoding: a per-query lookup table of m·k subspace dot
  * products turns the approximate dot into m array reads + adds.
  *
  * Spark-first shape: the fit is one Lloyd scan per iteration with
  * ALL subspaces fused (posexplode to (sub, subvec), argmin against
  * the inline codebook, one groupBy(sub, cell) per-dim average);
  * encoding and ADC scoring are single codegen'd projections (the
  * codebook rides inline as literals — model-sized, m·k·subDim
  * scalars); the candidate shuffle is bounded by the `TopKPairs`
  * aggregate exactly like the int8 two-stage scan. Vectors are
  * L2-normalized first so ADC dot approximates cosine and the exact
  * float rerank (same contract as `Similarity.quantizedTopK`) orders
  * the final k.
  *
  * Deterministic end to end — seeded init (first k vectors by id),
  * fixed iterations, total-order tie-breaks — so the fit/encode/
  * score pipeline is spec-verifiable (recall vs exact baseline, the
  * IVF/LSH pattern; no SQL oracle: k-means isn't SQL-expressible).
  */
object ProductQuantization {

  /** codebooks(s)(c) = centroid c of subspace s, length subDim. */
  case class PqModel(m: Int, k: Int, subDim: Int,
                     codebooks: Array[Array[Array[Double]]]) {
    require(codebooks.length == m && codebooks.forall(_.length == k))
  }

  private[ops] def normed(v: Column): Column = {
    val n = sqrt(graft.functions.Native.doubleDot(v, v))
    when(n === 0.0, v).otherwise(transform(v, x => x / n))
  }

  private def subvec(v: Column, s: Int, subDim: Int): Column =
    slice(v, s * subDim + 1, subDim)

  /** argmin-distance code for subspace `s`: max of (x·c − ‖c‖²/2)
    * (equivalent under expansion), ties to the smaller code. */
  private def codeOf(sub: Column, s: Int, model: PqModel): Column = {
    val entries = (0 until model.k).map { c =>
      val cent = model.codebooks(s)(c)
      val score = graft.functions.Native.doubleDot(sub,
        typedLit(cent.toSeq)) - lit(cent.map(x => x * x).sum / 2.0)
      struct((-score).as("d"), lit(c).as("c"))
    }
    array_min(array(entries: _*)).getField("c")
  }

  /** Fit per-subspace codebooks by fused Lloyd iterations: every
    * iteration is ONE corpus scan covering all m subspaces.
    * `normalize = false` fits the codebooks on the vectors AS GIVEN —
    * the residual-encoding path ([[IvfPq]]) passes v̂ − centroid
    * residuals, which must not be re-normalized.
    */
  def fit(df: DataFrame, idCol: String, vecCol: String, m: Int, k: Int,
          iters: Int = 5, normalize: Boolean = true): PqModel = {
    val vv = VectorOps.toDoubleVec(col(vecCol))
    val base = df.select(col(idCol).as("id"),
        (if (normalize) normed(vv) else vv).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dim = base.select(size(col("v"))).first().getInt(0)
      require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
      val subDim = dim / m
      // seeded init: subspace slices of the first k vectors by id —
      // the trainCentroids determinism convention
      val seed = base.orderBy("id").limit(k).collect()
        .map(_.getSeq[Double](1).toArray)
      require(seed.length == k, s"need at least k=$k vectors to fit")
      var model = PqModel(m, k, subDim,
        Array.tabulate(m)(s => seed.map(_.slice(s * subDim, (s + 1) * subDim))))
      for (_ <- 0 until iters) {
        val assigned = base.select(col("v")).select(posexplode(
            array((0 until m).map(s => subvec(col("v"), s, subDim)): _*))
            .as(Seq("sub", "sv")))
        val dimAggs = (0 until subDim)
          .map(i => avg(element_at(col("sv"), i + 1)).as(s"m_$i"))
        val curr = model
        val cellCol = (0 until m).foldLeft(lit(-1)) { (acc, s) =>
          when(col("sub") === s, codeOf(col("sv"), s, curr)).otherwise(acc)
        }
        val next = assigned.withColumn("cell", cellCol)
          .groupBy("sub", "cell").agg(dimAggs.head, dimAggs.tail: _*)
          .collect()
          .map(r => (r.getInt(0), r.getInt(1),
            Array.tabulate(subDim)(i => r.getDouble(i + 2))))
        val cb = model.codebooks.map(_.map(_.clone()))
        next.foreach { case (s, c, cent) => cb(s)(c) = cent }
        model = PqModel(m, k, subDim, cb) // empty cells keep their centroid
      }
      model
    } finally { base.unpersist(); () }
  }

  /** The m-code array for a vector column (normalized internally) —
    * the composable form [[IvfPq]] fuses with cell routing in one
    * projection. */
  def codesExpr(vec: Column, model: PqModel): Column = {
    val v = normed(VectorOps.toDoubleVec(vec))
    array((0 until model.m).map(s =>
      codeOf(subvec(v, s, model.subDim), s, model)): _*)
  }

  /** (id, codes): the m-byte representation — one codegen'd
    * projection, no shuffle. */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             model: PqModel): DataFrame =
    df.select(col(idCol).as("id"), codesExpr(col(vecCol), model).as("codes"))

  /** ADC top-k with exact float rerank: the code scan picks
    * overfetch·k candidates per query via the per-query LUT, the
    * rerank orders the final k by true cosine. Output
    * (qid, id, rank, cos) — the `quantizedTopK` contract.
    */
  def adcTopK(corpus: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, qIdCol: String, qVecCol: String,
              model: PqModel, k: Int, overfetch: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0 && overfetch > 0)
    // localCheckpoint, not persist: the frame is read twice (encode +
    // exact rerank) and a persisted frame would stay pinned in the
    // block manager until an unpersist this method has no seam to
    // call — repeated adcTopK calls in a long session would accrete
    // pinned cache (the Similarity.scala:273 convention).
    val base = corpus.select(col(idCol).as("id"),
        VectorOps.toDoubleVec(col(vecCol)).as("v"))
      .localCheckpoint(true)
    val codes = encode(base, "id", "v", model)
    val qv = normed(VectorOps.toDoubleVec(col(qVecCol)))
    // per-query LUT: lut[s·k + c] = q_sub(s) · codebook(s)(c)
    val lut = array((for (s <- 0 until model.m; c <- 0 until model.k)
      yield graft.functions.Native.doubleDot(
        subvec(qv, s, model.subDim),
        typedLit(model.codebooks(s)(c).toSeq))): _*)
    val qq = queries.select(col(qIdCol).as("qid"),
      VectorOps.toDoubleVec(col(qVecCol)).as("qv"), lut.as("lut"))
    val adc = (0 until model.m)
      .map(s => element_at(col("lut"),
        lit(s * model.k) + element_at(col("codes"), s + 1) + 1))
      .reduce(_ + _)
    val cand = codes.crossJoin(broadcast(qq.select("qid", "lut")))
      .select(col("qid"), adc.as("ascore"), col("id"))
      .groupBy("qid")
      .agg(graft.functions.Native.topKPairs(col("ascore"), col("id"),
        k * overfetch).as("top"))
      .select(col("qid"), explode(col("top")).as("pair"))
      .select(col("qid"), col("pair.id").as("id"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("id"))
    val out = cand
      .join(base, "id")
      .join(broadcast(qq.select("qid", "qv")), "qid")
      .select(col("qid"), col("id"),
        VectorOps.cosine(col("qv"), col("v")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("rank").cast("int").as("rank"),
        col("cos"))
    out
  }
}
