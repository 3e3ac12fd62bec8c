package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("rangeCount matches brute force incl. boundaries and bucket crossings") {
    val left = Seq((1L, ts(1000)), (2L, ts(600)), (3L, ts(10))).toDF("id", "ts")
    val right = Seq(
      ts(1000),       // == left.ts -> included (closed upper bound)
      ts(400),        // == 1000 - 600 -> EXCLUDED (open lower bound)
      ts(401),        // just inside for left 1, also in (0, 600] for left 2
      ts(999),        // crosses bucket boundary relative to left 2
      ts(5))          // only for left 3
      .map(Tuple1(_)).toDF("rts")
    val got = RangeJoin.rangeCount(left, right, "id", "ts", "rts", 600L)
      .orderBy("id").select("id", "n_in_range").as[(Long, Long)].collect()
    // brute force: l1 (400,1000]: {1000, 401, 999} = 3
    //              l2 (0,600]:    {400, 401, 5} = 3
    //              l3 (-590,10]:  {5} = 1
    assert(got.sameElements(Array((1L, 3L), (2L, 3L), (3L, 1L))))
  }

  test("left rows with no matches get zero") {
    val left = Seq((7L, ts(50))).toDF("id", "ts")
    val right = Seq(Tuple1(ts(5000))).toDF("rts")
    val got = RangeJoin.rangeCount(left, right, "id", "ts", "rts", 10L)
      .select("n_in_range").head.getLong(0)
    assert(got == 0L)
  }

  test("plan is an equi-join on the bucket key, not a nested loop") {
    val left = Seq((1L, ts(0))).toDF("id", "ts")
    val right = Seq(Tuple1(ts(1))).toDF("rts")
    val plan = RangeJoin.rangeCount(left, right, "id", "ts", "rts", 60L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }
}
