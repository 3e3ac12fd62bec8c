package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  // two independent uniform dimensions: x cycles, y jumps by a
  // coprime stride so (x, y) fills the grid evenly
  private def grid(n: Int): org.apache.spark.sql.DataFrame =
    (0 until n).map(i => (i.toLong % 1000L, (i.toLong * 7919L) % 1000L, i))
      .toDF("x", "y", "payload")

  /** Average per-file (max-min) extent of `c`, as a fraction of the
    * global span — the quantity parquet min/max skipping works on. */
  private def avgExtent(path: String, c: String, span: Double): Double = {
    val per = spark.read.parquet(path)
      .groupBy(input_file_name())
      .agg((max(col(c)) - min(col(c))).cast("double").as("ext"))
      .agg(avg("ext")).head().getDouble(0)
    per / span
  }

  test("z-order bounds per-file extents in BOTH dimensions; single-column sort does not") {
    val df = grid(20000)
    val zdir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val xdir = java.nio.file.Files.createTempDirectory("graft-xsort").toString
    Layout.zorderWrite(df, Seq("x", "y"), zdir, numFiles = 16)
    // baseline: the classic single-key layout
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xdir)

    val zx = avgExtent(zdir, "x", 999.0)
    val zy = avgExtent(zdir, "y", 999.0)
    val bx = avgExtent(xdir, "x", 999.0)
    val by = avgExtent(xdir, "y", 999.0)
    // x-sorted: x extents tiny, y extents ~ the whole domain
    assert(bx < 0.15, s"x-sorted baseline should bound x: $bx")
    assert(by > 0.85, s"x-sorted baseline cannot bound y: $by")
    // z-order: BOTH extents well under the domain (16 files ~ a 4x4
    // Morton grid -> ~1/4 span per dimension, plus curve-boundary
    // slop)
    assert(zx < 0.6, s"z-order should bound x: $zx")
    assert(zy < 0.6, s"z-order should bound y: $zy")
    // and the sum of bounded dimensions beats the baseline's
    assert(zx + zy < bx + by, s"z=($zx,$zy) vs baseline=($bx,$by)")
  }

  test("round-trip preserves rows exactly") {
    val df = grid(5000)
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder-rt").toString
    Layout.zorderWrite(df, Seq("x", "y"), dir, numFiles = 8)
    val back = spark.read.parquet(dir)
    assert(back.count() == 5000)
    assert(back.select(sum("payload")).head().getLong(0)
      == df.select(sum("payload")).head().getLong(0))
    assert(back.columns.sorted.toSeq == Seq("payload", "x", "y"))
  }

  test("morton code is monotone in each dimension holding the other fixed") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (1000L, 1000L))
      .toDF("x", "y")
    val z = Layout.mortonCode(df, Seq("x", "y"))
      .select("x", "y", "__z").as[(Long, Long, Long)].collect()
      .map { case (x, y, zz) => (x, y) -> zz }.toMap
    assert(z((0L, 0L)) < z((1L, 0L)))
    assert(z((0L, 0L)) < z((0L, 1L)))
    assert(z((3L, 3L)) < z((1000L, 1000L)))
  }

  test("constant column degrades gracefully (normalizes to zero, no overflow)") {
    val df = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("x", "y")
    val z = Layout.mortonCode(df, Seq("x", "y")).select("__z")
      .as[Long].collect()
    assert(z.forall(_ >= 0L) && z.distinct.length == 3)
  }

  test("three-dimension interleave stays within a signed long") {
    val df = (0 until 100).map(i => (i.toLong, (i * 31L) % 97L, (i * 7L) % 13L))
      .toDF("a", "b", "c")
    val z = Layout.mortonCode(df, Seq("a", "b", "c")).select("__z")
      .as[Long].collect()
    assert(z.forall(_ >= 0L))
  }
}
