package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The mergeable deterministic quantile sketch: bucket-geometry
  * invariants, fold ≡ recompute exactness, the relative-error
  * guarantee against exact quantiles, and partitioning invariance.
  */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val m = QuantileSketch.MantissaBits

  test("bucketOf/lowerBoundOf: lb(bucket(v)) <= v, exact below 2^(m+1), " +
    "relative width <= 2^-m above") {
    val vs = (0L to 200L) ++ Seq(255L, 256L, 1000L, 4095L, 4096L,
      1L << 40, (1L << 40) + 12345L, Long.MaxValue / 2)
    val rows = vs.toDF("v")
      .select(col("v"), QuantileSketch.bucketOf(col("v"), m).as("b"))
      .select(col("v"), col("b"),
        QuantileSketch.lowerBoundOf(col("b"), m).as("lb"))
      .collect()
    rows.foreach { r =>
      val (v, b, lb) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(lb <= v, s"v=$v bucket=$b lb=$lb")
      if (v < (1L << (m + 1))) assert(lb === v, s"small v=$v must be exact")
      else assert(v - lb <= (lb >> m), s"v=$v lb=$lb exceeds 2^-m width")
    }
    // bucket is monotone in v
    val bs = rows.sortBy(_.getLong(0)).map(_.getLong(1))
    assert(bs.zip(bs.tail).forall { case (a, c) => a <= c })
  }

  test("negative values (contract violation) raise — never a silently " +
    "skewed quantile") {
    // a silent null bucket would sort NULLS FIRST in Spark but NULLS
    // LAST in a DuckDB oracle chain, skewing cumulative ranks
    // differently per engine, and lowerBoundOf(null) reads as a null
    // estimate nobody notices — so the sketch fails loudly instead
    val e = intercept[Exception] {
      QuantileSketch.sketch(
        Seq(("g", -5L), ("g", 3L)).toDF("g", "v"), "g", "v").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("non-negative contract")), e.toString)
  }

  test("fold == recompute exactly, and merge is partitioning-invariant") {
    val data = (1 to 500).map(i => (s"g${i % 3}", (i * i % 997).toLong))
    val df = data.toDF("g", "v")
    val base = df.filter(col("v") % 5 =!= 0)
    val delta = df.filter(col("v") % 5 === 0)
    val folded = QuantileSketch.mergeSketches(
      QuantileSketch.sketch(base, "g", "v"),
      QuantileSketch.sketch(delta, "g", "v"), "g")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    val full = QuantileSketch.sketch(df, "g", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    assert(folded === full)
    val repart = QuantileSketch.sketch(df.repartition(7), "g", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    assert(repart === full)
  }

  test("estimates bracket the exact quantile within the 2^-m guarantee") {
    val data = (1 to 1000).map(i => ("g", (i * 37L) % 5000))
    val df = data.toDF("g", "v")
    val qs = Seq((1, 4), (1, 2), (3, 4), (19, 20))
    val est = QuantileSketch.quantiles(
      QuantileSketch.sketch(df, "g", "v"), "g", qs)
      .collect().map(r => (r.getInt(1), r.getInt(2)) -> r.getLong(4)).toMap
    val sorted = data.map(_._2).sorted
    qs.foreach { case (num, den) =>
      val rank = (sorted.size.toLong * num + den - 1) / den
      val exact = sorted((rank - 1).toInt)
      val e = est((num, den))
      assert(e <= exact, s"q=$num/$den est=$e above exact=$exact")
      assert(exact - e <= math.max(1L, e >> m),
        s"q=$num/$den est=$e too far below exact=$exact")
    }
  }

  test("groupMad: both composed estimates stay in the error envelope") {
    val data = (1 to 1000).map(i => ("g", (i * 37L) % 5000))
    val out = QuantileSketch.groupMad(data.toDF("g", "v"), "g", "v")
      .collect().head
    assert(out.getLong(1) === 1000L)
    val sorted = data.map(_._2).sorted
    val exactMed = sorted(499) // rank ceil(n/2) = 500, 0-indexed
    val estMed = out.getLong(2)
    assert(estMed <= exactMed &&
      exactMed - estMed <= math.max(1L, estMed >> m))
    // MAD is defined against the op's OWN median estimate — that is
    // what the second pass sketches, and what the oracle replicates
    val devs = data.map(d => math.abs(d._2 - estMed)).sorted
    val exactMad = devs(499)
    val estMad = out.getLong(3)
    assert(estMad <= exactMad &&
      exactMad - estMad <= math.max(1L, estMad >> m))
  }

  test("retraction fold equals the recompute of surviving rows exactly") {
    val base = (1 to 500).map(i => ("g", (i * 13L) % 997)).toDF("g", "v")
    val deleted = base.filter(col("v") % 3 === 0)
    val survivors = base.filter(col("v") % 3 =!= 0)
    val folded = QuantileSketch.mergeSketches(
        QuantileSketch.sketch(base, "g", "v"),
        QuantileSketch.retraction(deleted, "g", "v"), "g")
      .collect().map(r => (r.getLong(1), r.getLong(2))).sorted
    val recomputed = QuantileSketch.sketch(survivors, "g", "v")
      .collect().map(r => (r.getLong(1), r.getLong(2))).sorted
    assert(folded.toSeq === recomputed.toSeq && folded.nonEmpty)
    // fully-cancelled buckets are pruned, not carried as zeros
    val allGone = QuantileSketch.mergeSketches(
      QuantileSketch.sketch(base, "g", "v"),
      QuantileSketch.retraction(base, "g", "v"), "g")
    assert(allGone.count() === 0L)
  }

  test("retracting values never inserted raises instead of going negative") {
    val base = Seq(("g", 5L)).toDF("g", "v")
    val phantom = Seq(("g", 5L), ("g", 5L)).toDF("g", "v")
    val e = intercept[Exception] {
      QuantileSketch.mergeSketches(
        QuantileSketch.sketch(base, "g", "v"),
        QuantileSketch.retraction(phantom, "g", "v"), "g").collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.toString + "\n" + chain(t.getCause)
    assert(chain(e).contains("negative"), chain(e))
  }

  test("maintainGroupStats carries (n, s, s2, mn, mx) and folds exactly") {
    val base = Seq(("a", 4L), ("a", 9L), ("b", 1L)).toDF("g", "v")
    val delta = Seq(("a", 2L), ("c", 7L)).toDF("g", "v")
    val folded = Merge.maintainGroupStats(
        Merge.groupStats(base, "g", "v"), delta, "g", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(folded("a") === ((3L, 15L, 101L, 2L, 9L)))
    assert(folded("b") === ((1L, 1L, 1L, 1L, 1L)))
    assert(folded("c") === ((1L, 7L, 49L, 7L, 7L)))
  }
}
