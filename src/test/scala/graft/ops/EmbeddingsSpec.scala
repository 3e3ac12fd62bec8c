package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Array(3.0f, 4.0f)),
    (2L, Array(-1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f))).toDF("id", "vec")
  private val v = Embeddings.toDouble(col("vec"))

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
