package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("rrf fuses two rankings by hand-computed reciprocal ranks") {
    // leg A ranks: 10 (r1), 20 (r2), 30 (r3); leg B: 20 (r1), 10 (r2)
    val a = Seq((10L, 0.9), (20L, 0.5), (30L, 0.1)).toDF("id", "score")
    val b = Seq((20L, 7.0), (10L, 3.0)).toDF("id", "score")
    val got = Retrieval.rrfFuse(Seq(a, b), "id", "score", k = 60)
      .as[(Long, Double)].collect().toMap
    def rr(rs: Int*) = BigDecimal(rs.map(r => 1.0 / (60 + r)).sum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Map(10L -> rr(1, 2), 20L -> rr(2, 1), 30L -> rr(3)))
  }

  test("ties within a leg break by ascending id, deterministically") {
    val a = Seq((5L, 1.0), (3L, 1.0), (9L, 1.0)).toDF("id", "score")
    val got = Retrieval.rrfFuse(Seq(a), "id", "score")
      .orderBy(desc("rrf"), col("id")).as[(Long, Double)].collect().map(_._1)
    // equal scores -> rank by id: 3 (r1) > 5 (r2) > 9 (r3)
    assert(got.toSeq === Seq(3L, 5L, 9L))
  }

  test("a doc present in only one leg still scores") {
    val a = Seq((1L, 2.0)).toDF("id", "score")
    val b = spark.emptyDataset[(Long, Double)].toDF("id", "score")
    val got = Retrieval.rrfFuse(Seq(a, b), "id", "score", k = 60)
      .as[(Long, Double)].collect().toMap
    assert(got.keySet === Set(1L))
    assert(math.abs(got(1L) - 1.0 / 61) < 1e-6)
  }

  test("fused scores never compare raw leg scores across legs") {
    // leg scales differ by 1000x; fusion must depend only on ranks:
    // scaling one leg's scores changes nothing
    val a = Seq((1L, 0.001), (2L, 0.002)).toDF("id", "score")
    val aScaled = a.withColumn("score", col("score") * 1000)
    val b = Seq((2L, 5.0), (1L, 4.0)).toDF("id", "score")
    val x = Retrieval.rrfFuse(Seq(a, b), "id", "score").orderBy("id").collect()
    val y = Retrieval.rrfFuse(Seq(aScaled, b), "id", "score").orderBy("id").collect()
    assert(x.toSeq === y.toSeq)
  }
}
