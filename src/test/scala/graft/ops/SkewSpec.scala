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

  test("salted join equals the plain inner join on a skewed fact table") {
    import spark.implicits._
    // hot key 1 carries ~1/3 of fact rows
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val fact = li.select(
      when(col("l_suppkey") % 3 === 0, lit(1L))
        .otherwise(col("l_suppkey").cast("long")).as("key"),
      col("l_quantity"))
    val dim = graft.Tables.supplier(spark, "/root/testdata/sf0.001")
      .select(col("s_suppkey").cast("long").as("key"), col("s_nationkey"))
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join regime salting is built for
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def agg(df: org.apache.spark.sql.DataFrame) = df
        .groupBy("s_nationkey").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
        .orderBy("s_nationkey")
        .collect().map(r => (r.get(0), r.getLong(1), r.getDouble(2))).toSeq
      val salted = agg(Skew.saltedJoin(fact, dim, "key", salt = 8))
      val plain = agg(fact.join(dim, "key"))
      assert(salted == plain)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }
}
