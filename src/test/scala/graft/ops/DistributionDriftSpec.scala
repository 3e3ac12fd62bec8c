package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DistributionDriftSpec extends SparkSpec {
  import spark.implicits._

  private val base = (1 to 200).map(i => (i.toDouble, i.toLong)).toDF("v", "id")

  test("psi: identical samples score 0; a shifted sample is flagged") {
    val same = DistributionDrift.psi(base, base.select("v"), "v", "id")
      .collect()
    assert(same.length === 10)
    assert(same.forall(_.getAs[Double]("psi") == 0.0))
    assert(same.forall(r =>
      r.getAs[Long]("n_expected") == 20L && r.getAs[Long]("n_actual") == 20L))

    // shift the actual distribution up by half its range
    val shifted = base.select((col("v") + 100.0).as("v"))
    val drifted = DistributionDrift.psi(base, shifted, "v", "id").collect()
    val psi = drifted.head.getAs[Double]("psi")
    assert(psi > 0.25, s"psi $psi should flag a 50%-range shift") // "act" zone
    // bins the shifted sample vacated hit the 1e-6 floor, not infinity
    assert(drifted.forall(r => !r.getAs[Double]("contrib").isInfinite))
  }

  test("ksTest: hand-computed max CDF gap; identical samples score 0") {
    val a = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val b = Seq(3.0, 4.0, 5.0, 6.0).toDF("v")
    val r = DistributionDrift.ksTest(a, b, "v").collect()(0)
    assert(r.getDouble(0) === 0.5) // gap peaks at v in {2,3,4}
    assert((r.getLong(1), r.getLong(2)) === ((4L, 4L)))

    val z = DistributionDrift.ksTest(a, a, "v").collect()(0)
    assert(z.getDouble(0) === 0.0)

    // duplicated values: the CDF must step past ALL ties at once
    val ties = Seq(1.0, 1.0, 1.0, 2.0).toDF("v")
    val other = Seq(1.0, 2.0, 2.0, 2.0).toDF("v")
    // F_a(1)=0.75, F_b(1)=0.25 -> gap 0.5; at 2 both reach 1
    val t = DistributionDrift.ksTest(ties, other, "v").collect()(0)
    assert(t.getDouble(0) === 0.5)
  }
}
