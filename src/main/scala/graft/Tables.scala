package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated star schema (see TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part")
  /** events.parquet has shipped with two `ts` encodings across
    * driver-generated testdata versions: TIMESTAMP(MICROS) (read
    * natively) and TIMESTAMP(NANOS), which Spark 4 refuses to read
    * natively — for the latter, read nanos as long and convert to
    * micros precision. The branch keys off the ACTUAL read type, so
    * either vintage of the data works. NOTE for the nanos path:
    * (a) it sets the session-wide
    * `spark.sql.legacy.parquet.nanosAsLong` flag as a side effect, so
    * any OTHER nano-timestamp parquet read in the same session will
    * come back as LongType (events is the only such table here);
    * (b) DuckDB oracles see full nanos while Spark sees micros — the
    * driver-generated events are all exactly microsecond-aligned
    * (verified: 0 rows with sub-µs nanos at every SF), so comparisons
    * and `<=`/ordering semantics cannot diverge on this data.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = read(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // normalize to the LTZ TimestampType every consumer was built
        // and oracle-verified against (streaming watermarks REQUIRE
        // it: EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on NTZ). The cast
        // interprets the naive value in the session timezone — every
        // entrypoint builder (Verify, Bench, PlanAudit, SparkSpec)
        // pins spark.sql.session.timeZone=UTC, so the instant is
        // unchanged and Spark dumps stay value-identical to the
        // DuckDB oracle's naive read regardless of host config.
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** lineitem with a learnable binary label. The synthetic columns
    * are mutually independent (corr(l_extendedprice, l_quantity) ≈ 0),
    * so a label must be a function of the features to be learnable:
    * high-quantity low-discount lines. The tree can recover this
    * boundary exactly, which makes fit+predict oracle-checkable.
    */
  def labeledLineitem(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir).withColumn("class",
      (col("l_quantity") > 25.0 && col("l_discount") <= 0.05).cast("int"))
}
