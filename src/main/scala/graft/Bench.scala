package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/Spark warmup so the first timed queries aren't charged for
    // classloading + JIT/codegen compiler spin-up. One representative
    // per expression family: relational agg, level-wise fit (large
    // generated aggregates), text/array HOFs. Measured: a fit-shaped
    // query costs ~2x its steady state on a cold JIT.
    for (w <- Seq("q1_agg", "q_dt_fit_predict", "q_text_quality")) {
      val fn = SparkEntry.queries.getOrElse(w,
        sys.error(s"warmup query $w missing from SparkEntry.queries"))
      try { fn(spark, sfDir).count(); () }
      catch { case e: Throwable => System.err.println(s"[bench] warmup $w failed: $e") }
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      // isolate queries: persisted intermediates (minhash signatures,
      // LSH bandings, fit working sets) must not leak memory pressure
      // into later measurements
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
