package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class EvaluationSpec extends SparkSpec {
  import spark.implicits._

  private def metrics(rows: Seq[(Int, Double)]) =
    Evaluation.binaryMetrics(rows.toDF("y", "p"), "y", "p", 0.5).collect()(0)

  test("perfect separation scores AUC 1.0 and F1 1.0") {
    val m = metrics(Seq((1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1)))
    assert(m.getDouble(9) == 1.0)  // auc
    assert(m.getDouble(8) == 1.0)  // f1
    assert(m.getDouble(5) == 1.0)  // accuracy
  }

  test("constant score ties everything: AUC 0.5") {
    val m = metrics(Seq((1, 0.7), (0, 0.7), (1, 0.7), (0, 0.7)))
    assert(m.getDouble(9) == 0.5)
  }

  test("hand-computed mixed case with ties") {
    // scores: pos at .9, pos+neg tied at .6, neg at .2
    // ranks asc: .2 -> 1, .6 -> avg(2,3)=2.5, .9 -> 4
    // rank_sum(pos) = 2.5 + 4 = 6.5; P=2, N=2
    // AUC = (6.5 - 3) / 4 = 0.875
    val m = metrics(Seq((1, 0.9), (1, 0.6), (0, 0.6), (0, 0.2)))
    assert(m.getDouble(9) == 0.875)
    // at t=.5: tp=2 fp=1 fn=0 -> precision 2/3, recall 1, acc 3/4
    assert(m.getLong(2) == 2L && m.getLong(3) == 1L && m.getLong(4) == 0L)
    assert(m.getDouble(6) == 0.666667 && m.getDouble(7) == 1.0)
    assert(m.getDouble(5) == 0.75)
  }

  test("calibration table: perfectly calibrated bins show zero gap") {
    // bin 2 (p=0.25): 1 of 4 positive; bin 7 (p=0.75): 3 of 4 positive
    val rows = Seq((1, 0.25), (0, 0.25), (0, 0.25), (0, 0.25),
      (1, 0.75), (1, 0.75), (1, 0.75), (0, 0.75))
    val got = Evaluation.calibrationTable(rows.toDF("y", "p"), "y", "p")
      .orderBy("bin").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq === Seq((2, 4L, 0.25, 0.25, 0.0), (7, 4L, 0.75, 0.75, 0.0)))
    // p = 1.0 clamps into the last bin
    val top = Evaluation.calibrationTable(
        Seq((1, 1.0)).toDF("y", "p"), "y", "p")
      .collect()(0)
    assert(top.getInt(0) == 9)
  }

  test("k-ary calibration table: one-vs-rest bins, hand-computed") {
    // 3 classes; distributions chosen so class 0's p falls in two
    // bins with known observed rates and class 2 clamps into bin 9
    val rows = Seq(
      (0, 0.25, 0.5, 0.25), (1, 0.25, 0.5, 0.25),
      (0, 0.75, 0.15, 0.1), (0, 0.75, 0.15, 0.1),
      (2, 0.0, 0.0, 1.0))
    val df = rows.toDF("y", "p_0", "p_1", "p_2")
    val got = Evaluation.calibrationTableMulticlass(df, "y",
        Seq(0 -> "p_0", 1 -> "p_1", 2 -> "p_2"))
      .orderBy("cls", "bin").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    // class 0, bin 0 (p=0.0): 1 row, obs 0; bin 2 (p=.25): 2 rows,
    // obs 0.5; bin 7 (p=.75): 2 rows, obs 1.0
    assert(got.contains((0, 0, 1L, 0.0, 0.0)))
    assert(got.contains((0, 2, 2L, 0.25, 0.5)))
    assert(got.contains((0, 7, 2L, 0.75, 1.0)))
    // class 2: p=1.0 clamps into bin 9 with obs 1.0
    assert(got.contains((2, 9, 1L, 1.0, 1.0)))
    // every class contributes every row: 3 classes x 5 rows total
    assert(got.map(_._3).sum == 15L)
  }

  test("isotonic fit: classic PAV pools, weighted means, monotone output") {
    // scores .1/.2/.3 with observed rates 1, 0, 1: PAV merges the
    // first two into a 0.5 pool, the third stands alone
    val df = Seq((1, 0.1), (0, 0.2), (1, 0.3)).toDF("y", "p")
    val iso = Evaluation.isotonicFit(df, "y", "p")
    assert(iso.boundaries == Seq(0.2, 0.3) && iso.values == Seq(0.5, 1.0))
    // weighted merge: rate-1.0 x2 at .1, rate-0 x1 at .2 -> pool 2/3
    val w = Seq((1, 0.1), (1, 0.1), (0, 0.2), (1, 0.3)).toDF("y", "p")
    val isoW = Evaluation.isotonicFit(w, "y", "p")
    assert(isoW.boundaries == Seq(0.2, 0.3))
    assert(math.abs(isoW.values.head - 2.0 / 3.0) < 1e-12 &&
      isoW.values(1) == 1.0)
    // already-monotone input is the identity on pool means
    val mono = Seq((0, 0.1), (0, 0.2), (1, 0.2), (1, 0.3)).toDF("y", "p")
    val isoM = Evaluation.isotonicFit(mono, "y", "p")
    assert(isoM.values == Seq(0.0, 0.5, 1.0))
    // the expression clamps above the last boundary and maps inside
    val applied = Seq(0.05, 0.15, 0.25, 0.9).toDF("p")
      .select(iso.expr(col("p")).as("c")).collect().map(_.getDouble(0))
    assert(applied.toSeq == Seq(0.5, 0.5, 1.0, 1.0))
    // SQL render evaluates to the same map
    assert(iso.caseSql("p").contains("WHEN p <= 0.2 THEN 0.5"))
  }

  test("inverted classifier scores AUC 0.0; degenerate all-one-class AUC 0.5") {
    val inv = metrics(Seq((0, 0.9), (0, 0.8), (1, 0.2), (1, 0.1)))
    assert(inv.getDouble(9) == 0.0)
    val onlyPos = metrics(Seq((1, 0.9), (1, 0.1)))
    assert(onlyPos.getDouble(9) == 0.5)
  }

  test("k-ary isotonic: per-class PAV matches the binary fit, renormalization sums to 1") {
    // 3-class rows with per-class probability columns; each class's
    // one-vs-rest PAV must equal isotonicFit on the binarized label
    val rows = Seq(
      (0, 0.7, 0.2, 0.1), (0, 0.6, 0.3, 0.1), (1, 0.3, 0.5, 0.2),
      (1, 0.2, 0.6, 0.2), (2, 0.1, 0.3, 0.6), (2, 0.2, 0.2, 0.6),
      (0, 0.3, 0.5, 0.2), (2, 0.6, 0.3, 0.1))
    val df = rows.toDF("y", "p_0", "p_1", "p_2")
    val models = Evaluation.isotonicFitMulticlass(df, "y",
      Seq(0 -> "p_0", 1 -> "p_1", 2 -> "p_2")).toMap
    Seq(0, 1, 2).foreach { c =>
      val bin = df.select(
        (col("y") === c).cast("int").as("yb"), col(s"p_$c").as("p"))
      val ref = Evaluation.isotonicFit(bin, "yb", "p")
      assert(models(c) == ref, s"class $c")
      // monotone by construction
      assert(models(c).values.zip(models(c).values.tail)
        .forall { case (a, b) => a <= b })
    }
    // normalized serving: q_c / Σ q sums to 1 wherever Σ q > 0
    val withQ = Seq(0, 1, 2).foldLeft(df) { (d, c) =>
      d.withColumn(s"q_$c", models(c).expr(col(s"p_$c")))
    }
    val tot = Seq(0, 1, 2).map(c => col(s"q_$c")).reduce(_ + _)
    val sums = withQ
      .select(((col("q_0") + col("q_1") + col("q_2")) / tot).as("one"))
      .collect().map(_.getDouble(0))
    assert(sums.forall(s => math.abs(s - 1.0) < 1e-12))
  }
}
