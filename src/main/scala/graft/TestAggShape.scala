package graft
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r16 measurement harness (guide §1) behind the O7 evidence in
  * OPTIMIZATION_r16.md: isolates the per-row cost of the level-pass
  * aggregate shape on real sf data. A = pre-r16 shape (threshold CASE
  * re-evaluated inside every aggregate), B = factored (side booleans +
  * products projected once per row, the shape RegressionTree.fitOn now
  * builds). Prints interleaved wall times, per-stage executor CPU, and
  * an exact result-equality check. Steady state (JIT-warm) B ≈ 0.7×
  * A; the FIRST execution of either class costs ~9× its steady state —
  * the cold-codegen floor that pins the local fit-query numbers.
  */
object TestAggShape {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = e.stageInfo.taskMetrics
          if (m.executorRunTime > 200)
            println(f"    [stage ${e.stageInfo.stageId}%4d] tasks=${e.stageInfo.numTasks}%3d " +
              f"run=${m.executorRunTime}%6d ms cpu=${m.executorCpuTime / 1000000}%6d ms")
        }
      })
    import spark.implicits._

    val feats = Seq("l_discount", "l_quantity", "l_tax")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(feats.map(f => col(f).cast("double").as(f)): _*)
      .withColumn("__residual",
        col("l_quantity") * 0.3 - col("l_discount") * 2.0 + 0.17)
      .repartition(32)
      .persist()
    println(s"rows = ${li.count()}")

    val y = col("__residual")
    // a representative 2-open-node level: node in {2,3}, thresholds per feature
    def nodeExpr: Column =
      when(col("l_discount") <= 0.05, lit(2L)).otherwise(lit(3L))
    def thrExpr(f: String): Column =
      when(col("node") >= lit(2L),
        element_at(array(lit(0.021), lit(0.072)),
          (col("node") - 2 + 1).cast("int")))
        .otherwise(lit(Double.NaN))

    def aggsA: Seq[Column] = feats.flatMap { f =>
      val fc = col(f); val t = thrExpr(f)
      Seq(
        sum(when(fc <= t, y)).as(s"ls_$f"),
        sum(when(fc <= t, y * y)).as(s"lq_$f"),
        count(when(fc <= t, lit(1))).as(s"ln_$f"),
        sum(when(fc > t, y)).as(s"rs_$f"),
        sum(when(fc > t, y * y)).as(s"rq_$f"),
        count(when(fc > t, lit(1))).as(s"rn_$f")) ++
      feats.flatMap { g =>
        val gc = col(g); val w = abs(y)
        Seq({
          val ws = sum(when(fc <= t, w))
          when(ws > 0.0, sum(when(fc <= t, w * gc)) / ws)
            .otherwise(avg(when(fc <= t, gc))).as(s"cthl_${f}__$g")
        }, {
          val ws = sum(when(fc > t, w))
          when(ws > 0.0, sum(when(fc > t, w * gc)) / ws)
            .otherwise(avg(when(fc > t, gc))).as(s"cthr_${f}__$g")
        })
      }
    }

    def preB(df: DataFrame): DataFrame = {
      val side = feats.flatMap { f =>
        Seq((col(f) <= thrExpr(f)).as(s"__le_$f"),
            (col(f) > thrExpr(f)).as(s"__gt_$f"))
      }
      val prods = (abs(y).as("__w") +: (y * y).as("__yy") +:
        feats.map(g => (abs(y) * col(g)).as(s"__wg_$g")))
      df.select(col("*") +: (side ++ prods): _*)
    }
    def aggsB: Seq[Column] = feats.flatMap { f =>
      val le = col(s"__le_$f"); val gt = col(s"__gt_$f")
      Seq(
        sum(when(le, y)).as(s"ls_$f"),
        sum(when(le, col("__yy"))).as(s"lq_$f"),
        count(when(le, lit(1))).as(s"ln_$f"),
        sum(when(gt, y)).as(s"rs_$f"),
        sum(when(gt, col("__yy"))).as(s"rq_$f"),
        count(when(gt, lit(1))).as(s"rn_$f")) ++
      feats.flatMap { g =>
        val gc = col(g)
        Seq({
          val ws = sum(when(le, col("__w")))
          when(ws > 0.0, sum(when(le, col(s"__wg_$g"))) / ws)
            .otherwise(avg(when(le, gc))).as(s"cthl_${f}__$g")
        }, {
          val ws = sum(when(gt, col("__w")))
          when(ws > 0.0, sum(when(gt, col(s"__wg_$g"))) / ws)
            .otherwise(avg(when(gt, gc))).as(s"cthr_${f}__$g")
        })
      }
    }

    def time(tag: String)(body: => Array[org.apache.spark.sql.Row]): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s (rows=${r.length})")
    }
    val withNodeA = li.select(col("*"), nodeExpr.as("node"))
    val withNodeB = preB(li.select(col("*"), nodeExpr.as("node")))
    // warm both once, then interleave 3x each
    time("warm A")(withNodeA.groupBy("node").agg(aggsA.head, aggsA.tail: _*).collect())
    time("warm B")(withNodeB.groupBy("node").agg(aggsB.head, aggsB.tail: _*).collect())
    for (i <- 1 to 3) {
      time(s"A$i")(withNodeA.groupBy("node").agg(aggsA.head, aggsA.tail: _*).collect())
      time(s"B$i")(withNodeB.groupBy("node").agg(aggsB.head, aggsB.tail: _*).collect())
    }
    // result equality check
    val ra = withNodeA.groupBy("node").agg(aggsA.head, aggsA.tail: _*).orderBy("node").collect()
    val rb = withNodeB.groupBy("node").agg(aggsB.head, aggsB.tail: _*).orderBy("node").collect()
    println(s"identical = ${ra.sameElements(rb)}")
    spark.stop()
  }
}
