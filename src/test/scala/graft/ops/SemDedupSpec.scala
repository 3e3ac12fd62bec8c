package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** SemDeDup (cluster-scoped semantic dedup): planted-twin recall,
  * exactly-one-survivor-per-group, the paper's least-central
  * survivor rule on a hand-computable fixture, duplication
  * invariance, and degenerate inputs.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private def randVec(rng: Random, dim: Int): Array[Double] =
    Array.fill(dim)(rng.nextGaussian())

  /** 200 well-separated base vectors + a near-twin for each even id
    * (tiny perturbation → cosine ≈ 0.9998, far above threshold).
    */
  private lazy val planted: org.apache.spark.sql.DataFrame = {
    val rng = new Random(7)
    val base = (0 until 200).map(i => (i.toLong, randVec(rng, 32).toSeq))
    val twins = base.filter(_._1 % 2 == 0).map { case (i, v) =>
      (i + 1000L, v.zipWithIndex.map { case (x, j) =>
        x + 0.001 * (j % 3 - 1) }) }
    (base ++ twins).toDF("id", "v")
  }

  test("every planted twin pair collapses to one survivor; singletons all kept") {
    val out = Similarity.semDedup(planted, "id", "v",
        threshold = 0.95, nCells = 8, lloydIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length == 300)
    val byGroup = out.groupBy(_._2)
    // every group keeps exactly one member
    byGroup.foreach { case (g, ms) =>
      assert(ms.count(_._3) == 1, s"group $g kept ${ms.count(_._3)}")
    }
    // each twin (i, i+1000) shares a group — 100 pairs + 100 singles
    val groupOf = out.map(t => t._1 -> t._2).toMap
    (0 until 200 by 2).foreach { i =>
      assert(groupOf(i.toLong) == groupOf(i + 1000L), s"twins $i split")
    }
    assert(byGroup.size == 200)
    // odd-id singletons always survive
    (1 until 200 by 2).foreach { i =>
      assert(out.find(_._1 == i.toLong).get._3, s"singleton $i dropped")
    }
  }

  test("survivor is the member least similar to its cluster centroid") {
    // One cell. Centroid after 1 Lloyd iteration = mean of all
    // vectors. u1/u2 are a semantic pair; u2 sits farther from the
    // mean direction than u1 → u2 must be the survivor.
    val u1 = Seq(1.0, 0.02, 0.0)
    val u2 = Seq(1.0, -0.30, 0.0) // cos(u1,u2) ≈ 0.956
    val w = Seq(0.9, 0.9, 0.1)    // far from both (cos < 0.95)
    val df = Seq((10L, u1), (20L, u2), (30L, w)).toDF("id", "v")
    val out = Similarity.semDedup(df, "id", "v",
        threshold = 0.95, nCells = 1, lloydIters = 1)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(out == Map(10L -> false, 20L -> true, 30L -> true))
  }

  test("duplication-invariant: exact copies never add survivors") {
    val copies = planted.unionAll(
      planted.filter(col("id") < 50).select(col("id") + 5000L, col("v")))
      .unionAll(planted.filter(col("id") < 50).select(col("id") + 6000L, col("v")))
    val out = Similarity.semDedup(copies, "id", "v",
        threshold = 0.95, nCells = 8, lloydIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val keptBase = Similarity.semDedup(planted, "id", "v",
        threshold = 0.95, nCells = 8, lloydIters = 2)
      .filter(col("kept")).collect().map(_.getLong(0)).toSet
    // same survivors as without the copies; copies are all dropped
    assert(out.filter(_._3).map(_._1).toSet == keptBase)
    assert(out.count(_._3) == 200)
  }

  test("degenerate inputs: empty, all-identical") {
    assert(Similarity.semDedup(
      Seq.empty[(Long, Seq[Double])].toDF("id", "v"), "id", "v",
      threshold = 0.9).isEmpty)
    val same = (0 until 20).map(i => (i.toLong, Seq(1.0, 2.0, 3.0))).toDF("id", "v")
    val out = Similarity.semDedup(same, "id", "v",
        threshold = 0.9, nCells = 4)
      .collect().map(r => (r.getLong(0), r.getBoolean(2)))
    assert(out.count(_._2) == 1 && out.find(_._2).get._1 == 0L)
  }
}
