package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpec {

  test("every format round-trips the nation table") {
    val nation = graft.Tables.nation(spark, "/root/testdata/sf0.001")
    val base = nation.orderBy("n_nationkey").collect().toSeq
    Sources.Formats.foreach { fmt =>
      val dir = java.nio.file.Files.createTempDirectory(s"src_$fmt").toString + "/data"
      Sources.write(nation, dir, fmt)
      val back = Sources.read(spark, dir, fmt, Some(nation.schema))
        .orderBy("n_nationkey").collect().toSeq
      assert(back == base, s"format $fmt did not round-trip")
    }
  }

  test("partitioned writes prune to the matching directories on read") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    val dir = java.nio.file.Files.createTempDirectory("part_events").toString + "/data"
    Sources.writePartitioned(events, dir, "day")
    val firstDay = events.agg(min("day")).collect().head.getString(0)
    val pruned = spark.read.parquet(dir).filter(col("day") === firstDay)
    // the scan must prune partitions, not post-filter all of them
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1").trim.nonEmpty,
      s"no partition filter in scan:\n$plan")
    // every file actually read lives under the matching partition dir
    val files = pruned.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains(s"day=$firstDay")), files.take(3).mkString(","))
    // and the pruned read equals the unpartitioned filter
    assert(pruned.count() == events.filter(col("day") === firstDay).count())
  }

  test("bucketed tables join without a shuffle") {
    val o = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    val c = graft.Tables.customer(spark, "/root/testdata/sf0.001")
    Sources.writeBucketed(o.select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders_b", "o_custkey", 4)
    Sources.writeBucketed(c.select("c_custkey", "c_name"),
      "customer_b", "c_custkey", 4)
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == o.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }
}
