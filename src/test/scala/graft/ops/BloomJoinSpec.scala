package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloomSemiJoin equals the plain left_semi join") {
    val left = (0L until 1000L).map(i => (i, s"row$i")).toDF("k", "payload")
    val right = (0L until 1000L by 7L).map(i => Tuple1(i)).toDF("rk")
    val expected = left.join(right, left("k") === right("rk"), "left_semi")
      .select("k").as[Long].collect().sorted
    val got = BloomJoin.bloomSemiJoin(left, right, "k", "rk", expectedItems = 1000L)
      .select("k").as[Long].collect().sorted
    assert(got.sameElements(expected))
  }

  test("empty build side yields empty result") {
    val left = Seq((1L, "a")).toDF("k", "p")
    val right = Seq.empty[Tuple1[Long]].toDF("rk")
    assert(BloomJoin.bloomSemiJoin(left, right, "k", "rk", 10L).count() == 0L)
  }

  test("approx_count_distinct (HLL) stays within 5% of exact") {
    val df = spark.range(200000).select((col("id") % 12345L).as("k"))
    val row = df.agg(
      approx_count_distinct(col("k"), 0.02).as("a"),
      countDistinct("k").as("e")).head
    val (a, e) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.05)
  }

  test("bloomSemiJoin on STRING keys equals the plain left_semi join") {
    val left = (0 until 500).map(i => (s"name$i", i)).toDF("k", "payload")
    val right = (0 until 500 by 9).map(i => Tuple1(s"name$i")).toDF("rk")
    val expected = left.join(right, left("k") === right("rk"), "left_semi")
      .select("k").as[String].collect().sorted
    val got = BloomJoin.bloomSemiJoin(left, right, "k", "rk", expectedItems = 500L)
      .select("k").as[String].collect().sorted
    assert(got.sameElements(expected) && expected.nonEmpty)
  }

  test("mixed numeric key types (long vs double) still match exactly") {
    val left = (0L until 100L).map(i => (i, s"p$i")).toDF("k", "payload")
    val right = (0 until 100 by 7).map(i => Tuple1(i.toDouble)).toDF("rk")
    val expected = left.join(right, left("k") === right("rk"), "left_semi")
      .select("k").as[Long].collect().sorted
    val got = BloomJoin.bloomSemiJoin(left, right, "k", "rk", expectedItems = 100L)
      .select("k").as[Long].collect().sorted
    assert(got.sameElements(expected) && expected.nonEmpty)
  }

  test("probe is the codegen'd might_contain expression, not a UDF") {
    // Range leaves (unlike LocalRelation fixtures, whose filters
    // ConvertToLocalRelation folds away at optimization time) keep
    // the probe Filter visible in the physical plan.
    val left = spark.range(100).select(col("id").as("k"),
      col("id").cast("string").as("payload"))
    val right = spark.range(0, 100, 7).select(col("id").as("rk"))
    val plan = BloomJoin.bloomSemiJoin(left, right, "k", "rk", 100L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(1200))
    assert(!plan.contains("UDF"), plan.take(1200))
  }

  test("percentile_approx stays within 1% of the exact median") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val row = li.agg(
      expr("percentile_approx(l_extendedprice, 0.5, 1000)").as("a"),
      expr("percentile(l_extendedprice, 0.5)").as("e")).head
    val (a, e) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(a - e) / e < 0.01, s"approx $a exact $e")
  }
}
