package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")

  test("split is deterministic, disjoint, and complete") {
    val (tr1, te1) = Sampling.trainTestSplit(docs, "text", 80)
    val (tr2, _) = Sampling.trainTestSplit(docs, "text", 80)
    assert(tr1.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
           tr2.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    assert(tr1.count() + te1.count() == docs.count())
    assert(tr1.join(te1, "doc_id").count() == 0)
    // ratio within a loose band of 80%
    val frac = tr1.count().toDouble / docs.count()
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
  }

  test("different salts give different splits") {
    val a = Sampling.trainTestSplit(docs, "text", 50, salt = "a")._1
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.trainTestSplit(docs, "text", 50, salt = "b")._1
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a != b)
  }

  test("downsampling keeps all minority rows") {
    val labeled = graft.Tables.labeledLineitem(spark, "/root/testdata/sf0.001")
      .withColumn("key", concat(col("l_orderkey"), lit("_"), col("l_linenumber"), lit("_"), col("l_quantity")))
    val minority = labeled.filter(col("class") === 1).count()
    val out = Sampling.downsampleClass(labeled, "class", "key", majorityClass = 0, keepPct = 30)
    assert(out.filter(col("class") === 1).count() == minority)
    val kept0 = out.filter(col("class") === 0).count().toDouble /
      labeled.filter(col("class") === 0).count()
    assert(kept0 > 0.2 && kept0 < 0.4, s"kept majority fraction $kept0")
  }
}
