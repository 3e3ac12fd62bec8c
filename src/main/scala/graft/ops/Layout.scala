package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton-curve) clustering
  * for parquet scan pruning on MORE THAN ONE column.
  *
  * A 100 TB table sorted on `ts` prunes row groups beautifully for
  * time predicates and not at all for `user_id` predicates — every
  * file's user_id min/max spans the whole domain. Interleaving the
  * bits of both columns and range-partitioning + sorting on that
  * Morton code gives every file a BOUNDED min/max rectangle in BOTH
  * dimensions, so parquet row-group statistics (and any file-level
  * min/max index built on top) skip on either predicate. This is the
  * published Delta/Iceberg `ZORDER BY` technique, built here from
  * plain Spark primitives:
  *
  *   zorderWrite = repartitionByRange(z) . sortWithinPartitions(z)
  *                 . write.parquet
  *
  * The Morton code itself is a pure codegen'd Column expression
  * (shift/mask bit spreading — no UDF), each input rank-normalized
  * into 21 bits so two or three dimensions pack into one signed long
  * without overflow. Range partitioning samples the z-distribution,
  * so skewed inputs still split into equal-sized files; the sort
  * within each task keeps row groups tight, which is what parquet
  * stats actually skip on.
  *
  * Trade-off vs bucketing (io.Sources.writeBucketed): bucketing
  * co-locates JOINS on one key; z-order tightens RANGE/point SCANS
  * on several. They compose — bucket by join key, z-order within
  * buckets via sortWithinPartitions — but this object ships the scan
  * half.
  */
object Layout {

  private val Bits = 21 // 3 x 21 = 63 bits: fits a signed long

  /** Spread the low 21 bits of `x` so consecutive bits land `step`
    * apart (step = number of interleaved dimensions). Plain
    * shift/or/mask Column algebra — whole-stage codegen keeps this
    * one fused projection.
    */
  private def spread(x: Column, step: Int): Column =
    (0 until Bits).map { i =>
      shiftleft(shiftrightunsigned(x, i).bitwiseAND(lit(1L)), i * step)
    }.reduce(_.bitwiseOR(_))

  /** Morton code of 2-3 columns, each first rank-normalized to
    * [0, 2^21) via its min/max (broadcast scalar aggregate — one
    * tiny job) so domains of wildly different widths contribute
    * equal bit weight. Constant columns normalize to 0.
    */
  def mortonCode(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2 && cols.size <= 3,
      s"z-order interleaves 2-3 columns, got ${cols.size}")
    val span = lit((1L << Bits) - 1)
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).cast("double").as(s"__lo_$c"),
      max(col(c)).cast("double").as(s"__hi_$c")))
    val mm = df.agg(aggs.head, aggs.tail: _*)
    val joined = df.crossJoin(broadcast(mm))
    val z = cols.zipWithIndex.map { case (c, i) =>
      val lo = col(s"__lo_$c"); val hi = col(s"__hi_$c")
      val norm = when(hi === lo, lit(0L)).otherwise(
        least(floor((col(c).cast("double") - lo) / (hi - lo) *
          ((1L << Bits).toDouble)).cast("long"), span))
      shiftleft(spread(norm, cols.size), i)
    }.reduce(_.bitwiseOR(_))
    joined.withColumn("__z", z)
      .drop(cols.flatMap(c => Seq(s"__lo_$c", s"__hi_$c")): _*)
  }

  /** Write `df` as `numFiles` parquet files z-ordered on `cols`.
    * Each output file covers one contiguous Morton range, so its
    * parquet min/max stats bound EVERY interleaved column — a
    * predicate on any of them skips most files/row groups.
    */
  def zorderWrite(df: DataFrame, cols: Seq[String], path: String,
                  numFiles: Int): Unit = {
    mortonCode(df, cols)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
