package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted aggregate equals plain aggregate on real data") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val salted = Skew.saltedAggregate(li, Seq("l_returnflag"),
      Map("l_quantity" -> "sum", "l_orderkey" -> "count",
          "l_extendedprice" -> "max"), salt = 8)
      .orderBy("l_returnflag").collect()
    val plain = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("sum_l_quantity"),
        count("l_orderkey").as("count_l_orderkey"),
        max("l_extendedprice").as("max_l_extendedprice"))
      .orderBy("l_returnflag").collect()
    assert(salted.length == plain.length)
    salted.zip(plain).foreach { case (s, p) =>
      assert(s.getString(0) == p.getString(0))
      assert(math.abs(s.getDouble(1) - p.getDouble(1)) < 1e-6)
      assert(s.getLong(2) == p.getLong(2))
      assert(s.getDouble(3) == p.getDouble(3))
    }
  }

  test("salted aggregate handles a pathologically hot key") {
    import spark.implicits._
    val hot = spark.range(0, 100000).select(
      lit("HOT").as("k"), (col("id") % 100).cast("double").as("v"))
      .union(spark.range(0, 10).select(lit("cold").as("k"), col("id").cast("double").as("v")))
    val out = Skew.saltedAggregate(hot, Seq("k"), Map("v" -> "sum"), salt = 32)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("HOT") == (0 until 100).map(_.toDouble).sum * 1000)
    assert(out("cold") == 45.0)
  }
}
