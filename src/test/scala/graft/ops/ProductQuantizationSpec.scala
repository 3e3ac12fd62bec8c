package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PQ/ADC: planted-twin recall through the code scan + rerank,
  * deterministic fit/encode, and the compression-shape contract.
  */
class ProductQuantizationSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64
  private val rnd = new scala.util.Random(42)
  private def randVec(): Array[Double] = Array.fill(dim)(rnd.nextGaussian())

  /** 120 base vectors; ids 0-19 get a near-twin at id+1000 (small
    * deterministic perturbation — cosine ≈ 0.999). */
  private lazy val data: Seq[(Long, Seq[Double])] = {
    val base = (0 until 120).map(i => (i.toLong, randVec()))
    val twins = base.take(20).map { case (i, v) =>
      (i + 1000L, v.map(x => x + 0.02 * rnd.nextGaussian()))
    }
    (base ++ twins).map { case (i, v) => (i, v.toSeq) }
  }

  private lazy val df = data.toDF("vec_id", "embedding")

  test("planted twins survive the ADC scan into the reranked top k") {
    val model = ProductQuantization.fit(df, "vec_id", "embedding",
      m = 8, k = 16, iters = 4)
    val queries = df.filter(col("vec_id") >= 1000L)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val top = ProductQuantization.adcTopK(df, "vec_id", "embedding",
        queries, "qid", "qv", model, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val hit = (0 until 20).count { i =>
      top.exists(t => t._1 == i + 1000L && t._2 == i.toLong)
    }
    assert(hit >= 18, s"only $hit/20 twins in reranked top-5")
    // rank 1 must be the query itself (it is in the corpus)
    val self = top.filter(_._3 == 1)
    assert(self.forall(t => t._1 == t._2), "rank 1 should be the query itself")
  }

  test("fit and encode are deterministic; codes have the m/k shape") {
    val m1 = ProductQuantization.fit(df, "vec_id", "embedding", 8, 16, 3)
    val m2 = ProductQuantization.fit(df, "vec_id", "embedding", 8, 16, 3)
    assert(m1.codebooks.flatten.flatten.toSeq ===
      m2.codebooks.flatten.flatten.toSeq)
    val codes = ProductQuantization.encode(df, "vec_id", "embedding", m1)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1))
    assert(codes.forall(_._2.size == 8))
    assert(codes.forall(_._2.forall(c => c >= 0 && c < 16)))
    val again = ProductQuantization.encode(df, "vec_id", "embedding", m1)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1))
    assert(codes.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("fit rejects non-divisible subspace splits") {
    intercept[IllegalArgumentException] {
      ProductQuantization.fit(df, "vec_id", "embedding", m = 7, k = 4, 1)
    }
  }
}
