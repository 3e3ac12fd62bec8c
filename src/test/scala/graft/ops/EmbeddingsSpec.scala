package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  test("PCA: orthonormal basis, eigen equation, variance capture, recon error") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val k = 4
    val model = Embeddings.fitPca(emb, "embedding", k)
    val d = model.means.length

    // orthonormal rows
    for (i <- 0 until k; j <- i until k) {
      val dot = model.basis(i).zip(model.basis(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"basis($i)·basis($j) = $dot")
    }

    // eigenvalues descending and nonnegative
    assert(model.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    assert(model.eigenvalues.forall(_ >= -1e-12))

    // A·b == lambda·b against an independently computed covariance
    val rows = emb.select(Embeddings.toDouble($"embedding")).collect()
      .map(_.getSeq[Double](0).toArray)
    val n = rows.length.toDouble
    val means = Array.tabulate(d)(i => rows.map(_(i)).sum / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      rows.map(r => (r(i) - means(i)) * (r(j) - means(j))).sum / n)
    for (c <- 0 until k) {
      val b = model.basis(c)
      val ab = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * b(j)).sum)
      val resid = math.sqrt(
        ab.zip(b).map { case (x, y) => val e = x - model.eigenvalues(c) * y; e * e }.sum)
      assert(resid < 1e-6, s"eigen residual $resid for component $c")
    }

    // projected: score variance per component == eigenvalue; mean
    // recon error == tail eigenvalue sum
    val proj = Embeddings.pcaProject(emb, "vec_id", "embedding", model).collect()
    for (c <- 0 until k) {
      val s = proj.map(_.getDouble(1 + c))
      val m = s.sum / n
      val v = s.map(x => (x - m) * (x - m)).sum / n
      assert(math.abs(v - model.eigenvalues(c)) < 1e-4 * math.max(1.0, model.eigenvalues(c)),
        s"score variance $v vs eigenvalue ${model.eigenvalues(c)}")
    }
    val fullLam = {
      val (lam, _) = Embeddings.jacobiEigen(cov)
      lam.sorted.reverse
    }
    val tail = fullLam.drop(k).sum * n / n // population tail variance
    val meanErr = proj.map(_.getDouble(1 + k)).sum / n
    assert(math.abs(meanErr - tail) < 1e-4 * math.max(1.0, tail),
      s"mean recon err $meanErr vs tail eigensum $tail")
    assert(proj.forall(_.getDouble(1 + k) >= -1e-6)) // errors nonnegative
  }

  test("PCA on an exactly low-rank fixture recovers the plane") {
    // points on a 2-d plane embedded in 5-d: recon error with k=2 is 0
    val vs = (0 until 40).map { i =>
      val a = math.sin(i * 1.7); val b = math.cos(i * 0.9)
      (i.toLong, Array(a + 2 * b, 2 * a - b, a, b, a + b).map(_.toFloat))
    }
    val df = vs.toDF("vec_id", "embedding")
    val model = Embeddings.fitPca(df, "embedding", 2)
    val proj = Embeddings.pcaProject(df, "vec_id", "embedding", model).collect()
    assert(proj.forall(r => math.abs(r.getDouble(3)) < 1e-6),
      "rank-2 data must reconstruct exactly with 2 components")
    assert(model.eigenvalues(1) > 1e-3) // genuinely 2-dimensional
  }

  private val df = Seq(
    (1L, Array(3.0f, 4.0f)),
    (2L, Array(-1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f))).toDF("id", "vec")
  private val v = Embeddings.toDouble(col("vec"))

  test("Mahalanobis: whitened distance matches the closed form on a known covariance") {
    // axis-aligned gaussian-ish fixture: x ~ {-3,-1,1,3} (var 5),
    // y ~ {-0.2, 0.2} (var 0.04), many rows -> Σ ≈ diag(5, 0.04);
    // score of (5, 0) ≈ 25/5 = 5, score of (0, 1) ≈ 1/0.04 = 25:
    // the SMALL-variance direction dominates — what Euclidean misses
    val rows = for (x <- Seq(-3.0, -1.0, 1.0, 3.0); y <- Seq(-0.2, 0.2);
                    _ <- 1 to 5) yield (x, y)
    val df = rows.zipWithIndex
      .map { case ((x, y), i) => (i.toLong, Seq(x, y)) }
      .toDF("vec_id", "v")
    val m = Embeddings.fitMahalanobis(df, "v")
    def score(x: Double, y: Double): Double =
      Seq((0L, Seq(x, y))).toDF("vec_id", "v")
        .select(m.scoreExpr(col("v"))).head().getDouble(0)
    assert(math.abs(score(5.0, 0.0) - 5.0) < 0.01)
    assert(math.abs(score(0.0, 1.0) - 25.0) < 0.05)
    // the mean scores ~0
    assert(score(0.0, 0.0) < 1e-6)
  }

  test("Mahalanobis: planted spikes top the embeddings corpus") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val planted = Seq(
      (900001L, Seq.fill(64)(3.0f)),
      (900002L, Seq.tabulate(64)(i => if (i % 2 == 0) 4.0f else -4.0f)))
      .toDF("vec_id", "embedding")
    val corpus = emb.unionByName(planted)
    val m = Embeddings.fitMahalanobis(corpus, "embedding")
    val top = corpus.select(col("vec_id"), m.scoreExpr(col("embedding")).as("s"))
      .orderBy(col("s").desc, col("vec_id"))
      .limit(2).collect().map(_.getLong(0)).toSet
    assert(top == Set(900001L, 900002L), s"top-2: $top")
  }

  test("l2Norm") {
    val norms = df.orderBy("id").select(Embeddings.l2Norm(v)).collect().map(_.getDouble(0))
    assert(norms.sameElements(Array(5.0, 1.0, 0.0)))
  }

  test("normalized is unit length; zero vector passes through") {
    val out = df.orderBy("id").select(Embeddings.normalized(v)).collect()
      .map(_.getSeq[Double](0))
    assert(out(0) == Seq(0.6, 0.8))
    assert(out(1) == Seq(-1.0, 0.0))
    assert(out(2) == Seq(0.0, 0.0))
  }

  test("int8 quantization bounds and round-trip error") {
    val vecs = Seq((1L, Array.tabulate(64)(i => math.sin(i * 1.7).toFloat)))
      .toDF("id", "vec")
    val vv = Embeddings.toDouble(col("vec"))
    val sc = Embeddings.quantScale(vv)
    val row = vecs.select(
      Embeddings.quantizeInt8(vv, sc).as("q"),
      sc.as("s"),
      Embeddings.quantMse(vv, sc).as("mse")).head
    val q = row.getSeq[Long](0)
    val s = row.getDouble(1)
    assert(q.forall(x => x >= -127 && x <= 127))
    assert(q.exists(x => math.abs(x) == 127)) // max element hits full range
    // per-element error is at most half a quantization step
    assert(row.getDouble(2) <= 0.25 / (s * s) + 1e-15)
  }

  test("zero vector quantizes to zeros with guard scale") {
    val r = df.filter(col("id") === 3)
      .select(Embeddings.quantizeInt8(v, Embeddings.quantScale(v))).head.getSeq[Long](0)
    assert(r == Seq(0L, 0L))
  }
}
