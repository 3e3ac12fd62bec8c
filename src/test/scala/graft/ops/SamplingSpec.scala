package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("shardAssign: deterministic, partition-invariant, contiguous positions") {
    val df = (1L to 200L).toDF("id")
    val a = Sampling.shardAssign(df, "id", 4).orderBy("id").collect().toSeq
    val b = Sampling.shardAssign(df.repartition(7), "id", 4)
      .orderBy("id").collect().toSeq
    assert(a === b)
    val stats = Sampling.shardAssign(df, "id", 4)
      .groupBy("shard")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.min("pos").as("mn"),
        org.apache.spark.sql.functions.max("pos").as("mx"))
      .collect()
    assert(stats.length == 4) // 200 hashed keys hit all 4 shards
    assert(stats.forall(r => r.getLong(2) == 1L && r.getLong(3) == r.getLong(1)))
    // a different salt reshuffles
    val c = Sampling.shardAssign(df, "id", 4, salt = "epoch2")
      .orderBy("id").collect().toSeq
    assert(a !== c)
  }

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

  test("stratifiedSample keeps exactly k rows per group, deterministically") {
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    val s1 = Sampling.stratifiedSample(orders, "o_orderpriority", "o_orderkey", 5)
    val counts = s1.groupBy("o_orderpriority").count()
      .collect().map(_.getLong(1))
    assert(counts.nonEmpty && counts.forall(_ == 5L))
    // repartitioning must not change the selection
    val s2 = Sampling.stratifiedSample(orders.repartition(7), "o_orderpriority", "o_orderkey", 5)
    val k1 = s1.select("o_orderkey").collect().map(_.getLong(0)).toSet
    val k2 = s2.select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(k1 == k2)
  }

  test("stratifiedSample returns whole groups smaller than k") {
    import spark.implicits._
    val tiny = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("g", "k")
    assert(Sampling.stratifiedSample(tiny, "g", "k", 5).count() == 3L)
  }

  test("weightedSample favors heavy weights and is partition-invariant") {
    import spark.implicits._
    // 900 light rows (w=1) vs 100 heavy rows (w=50): a 50-row sample
    // should be dominated by heavy rows
    val df = (0 until 1000).map(i => (i.toLong, if (i < 100) 50.0 else 1.0))
      .toDF("k", "w")
    val s1 = Sampling.weightedSample(df, "k", "w", 50)
      .select("k").as[Long].collect().toSet
    val heavy = s1.count(_ < 100)
    assert(heavy > 35, s"expected heavy-weight dominance, got $heavy/50")
    val s2 = Sampling.weightedSample(df.repartition(13), "k", "w", 50)
      .select("k").as[Long].collect().toSet
    assert(s1 == s2)
  }

  test("tokenBudgetCap is maximal, budget-respecting, and partition-invariant") {
    val budget = 800L
    val kept = Sampling.tokenBudgetCap(docs, "source", "doc_id", "text", budget)
    val perGroup = kept.groupBy("source")
      .agg(sum("doc_tokens").as("tok"), count(lit(1)).as("n")).collect()
    assert(perGroup.nonEmpty)
    perGroup.foreach { r =>
      assert(r.getAs[Long]("tok") <= budget,
        s"${r.getAs[String]("source")} kept ${r.getAs[Long]("tok")} tokens")
    }
    // maximality: every dropped doc would push its group past budget
    // when inserted at its content-hash position — equivalently, the
    // kept count matches the window-prefix definition exactly
    val viaWindow = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("source").orderBy(md5(col("text")), col("doc_id"))
      docs.withColumn("t", graft.ops.TextAnalysis.wsTokenCount(col("text")).cast("long"))
        .withColumn("cum", sum("t").over(w))
        .filter(col("cum") <= budget).count()
    }
    assert(kept.count() == viaWindow)
    val repart = Sampling.tokenBudgetCap(docs.repartition(17), "source", "doc_id", "text", budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(repart == kept.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("mixtureSample keeps each source near its target rate") {
    val rates = Map("src0" -> 1.0, "src1" -> 0.5)
    val out = Sampling.mixtureSample(docs, "source", "text", rates, 0.2)
    val total = docs.groupBy("source").count()
      .withColumnRenamed("count", "n_total")
    val kept = out.groupBy("source").count()
      .withColumnRenamed("count", "n_kept")
    val fracs = total.join(kept, Seq("source"), "left")
      .na.fill(0L, Seq("n_kept")).collect()
      .map(r => r.getAs[String]("source") ->
        r.getAs[Long]("n_kept").toDouble / r.getAs[Long]("n_total")).toMap
    assert(fracs("src0") == 1.0, s"rate-1.0 source must keep all rows, got ${fracs("src0")}")
    assert(math.abs(fracs("src1") - 0.5) < 0.25, s"src1 frac ${fracs("src1")}")
    val defaulted = fracs.collect { case (k, v) if !rates.contains(k) => v }
    val meanDefault = defaulted.sum / defaulted.size
    assert(math.abs(meanDefault - 0.2) < 0.1, s"default-rate mean $meanDefault")
  }

  test("mixtureSample is deterministic and partition-invariant; rate 0 drops all") {
    val rates = Map("src0" -> 0.0, "src1" -> 0.4)
    val a = Sampling.mixtureSample(docs, "source", "text", rates, 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.mixtureSample(docs.repartition(17), "source", "text", rates, 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    val src0 = Sampling.mixtureSample(docs, "source", "text", rates, 0.3)
      .filter(col("source") === "src0").count()
    assert(src0 == 0L)
  }

  test("lmScoresAgainst smooths bigrams and prefixes the model never saw") {
    val train = Seq((1L, "a b")).toDF("doc_id", "text")
    val score = Seq((1L, "a b"), (2L, "a c"), (3L, "x y"), (4L, "solo"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.lmScoresAgainst(train, score, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Option[Double], Long)].collect().toSeq
    def r(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // V(train) = {a, b} = 2; c12("a b") = 1, c1("a") = 1
    assert(got(0) === ((1L, Some(r(math.log(2) - math.log(3))), 1L)))
    // seen prefix, unseen bigram: ln(1) - ln(1 + 2)
    assert(got(1) === ((2L, Some(r(-math.log(3))), 1L)))
    // nothing seen: ln(1) - ln(0 + 2)
    assert(got(2) === ((3L, Some(r(-math.log(2))), 1L)))
    // no bigrams: null score, 0 bigrams
    assert(got(3) === ((4L, None, 0L)))
  }

  test("dsirWeights up-weights target-like docs over outliers") {
    val df = Seq(
      (1L, "the cat sat on the mat", "en"),
      (2L, "the cat ran to the mat", "en"),
      (3L, "the cat sat on the rug", "xx"),
      (4L, "zzz qqq www kkk jjj fff", "xx"),
      (5L, "one", "xx")).toDF("doc_id", "text", "lang")
    val got = Sampling.dsirWeights(df, "doc_id", "text", col("lang") === "en")
      .orderBy("doc_id").as[(Long, Option[Double], Long)].collect().toSeq
    val lw = got.map(r => r._1 -> r._2).toMap
    // doc 3 shares almost all its bigrams with the target slice,
    // doc 4 shares none: the log-ratio must rank 3 above 4
    assert(lw(3L).get > lw(4L).get,
      s"target-like ${lw(3L)} must beat outlier ${lw(4L)}")
    // no-bigram doc: null weight, zero bigrams
    assert(got(4) === ((5L, None, 0L)))
    // weights are finite (smoothing leaves no -inf/NaN)
    got.flatMap(_._2).foreach(w => assert(!w.isNaN && !w.isInfinite))
  }

  // ---- hashed fixed-bucket LM (the 100 TB DSIR form) ---------------

  /** Independent re-implementation of the portable bucket hash
    * (md5 first 8 hex digits mod buckets) — NOT the Spark expression,
    * so the spec checks the operator against a second implementation.
    */
  private def refBucket(bg: String, buckets: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bg.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16) % buckets
  }

  test("hashedLmModel is bounded by the bucket count, never the vocabulary") {
    // 3000 distinct bigrams >> 64 buckets: the model MUST fold
    val docs = (0 until 3000).map(i => (i.toLong, s"w$i w${i + 1000000}"))
      .toDF("doc_id", "text")
    val model = TextAnalysis.hashedLmModel(docs, "text", 64)
    val rows = model.collect()
    assert(rows.length <= 64, s"model has ${rows.length} rows > 64 buckets")
    // every bigram is counted exactly once somewhere
    assert(rows.map(_.getLong(1)).sum === 3000L)
  }

  test("lmScoresHashedAgainst matches hand-computed bucket arithmetic") {
    val B = 16
    val train = Seq((1L, "a b")).toDF("doc_id", "text")
    val score = Seq((1L, "a b"), (2L, "a c"), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.lmScoresHashedAgainst(train, score, "doc_id", "text", B)
      .orderBy("doc_id").as[(Long, Option[Double], Long)].collect().toSeq
    def r(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // model: N = 1 bigram ("a b") in bucket refBucket("a b")
    val seen = r(math.log(2) - math.log(1 + B))   // c=1 bucket
    val unseen = r(math.log(1) - math.log(1 + B)) // c=0 bucket
    assert(got(0) === ((1L, Some(seen), 1L)))
    // "a c" scores as seen iff its bucket collides with "a b"'s —
    // decided by the independent reference hash, not the operator
    val expected2 =
      if (refBucket("a c", B) == refBucket("a b", B)) seen else unseen
    assert(got(1) === ((2L, Some(expected2), 1L)))
    assert(got(2) === ((3L, None, 0L)))
  }

  test("hashed LM: planted Zipf-hot bigram never shuffles on the model key") {
    // one bigram carries 20k of 21k total occurrences — the "of the"
    // profile that breaks the exact-bigram join. The hashed form must
    // (a) run it through BROADCAST joins only (no shuffle join keyed
    // on the bucket), (b) still count it correctly.
    val hot = (0 until 20000).map(i => (i.toLong, "of the"))
    val tail = (0 until 1000).map(i => (100000L + i, s"t$i u$i"))
    val docs = (hot ++ tail).toDF("doc_id", "text")
    val scoredDf = TextAnalysis.lmScoresHashed(docs, "doc_id", "text", 256)
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    scoredDf.collect() // finalize AQE
    val plan = scoredDf.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val bucketShuffleJoins = graft.PlanAudit.flatten(plan).filter {
      case j: SortMergeJoinExec => j.leftKeys.exists(_.toString.contains("bkt"))
      case j: ShuffledHashJoinExec => j.leftKeys.exists(_.toString.contains("bkt"))
      case _ => false
    }
    assert(bucketShuffleJoins.isEmpty,
      s"model join shuffled on the bucket key:\n${bucketShuffleJoins.mkString("\n")}")
    // correctness under the hot key: every hot doc scores identically,
    // and the hot bucket's count dominates its probability
    val byDoc = scoredDf.filter(col("doc_id") < 20000).select("lm_score")
      .distinct().collect()
    assert(byDoc.length === 1, "identical hot docs must score identically")
    val hotScore = byDoc(0).getDouble(0)
    val B = 256
    // hot bucket holds >= 20000 of N = 21000 bigrams
    assert(hotScore > math.log(20000 + 1) - math.log(21000 + B) - 1e-9)
  }

  test("dsirSelect keeps exactly the top-k by weight; quantile form tracks it") {
    // 40 docs in two populations: target-like (share bigrams with the
    // en slice) and outliers whose SHARED vocabulary is common in the
    // corpus but absent from the target — the log-ratio must prefer
    // the target-like population. (Outliers share text deliberately:
    // a per-doc-unique vocabulary would be RARE under the base model
    // and so barely penalized — the method downweights text common
    // in the corpus but unlike the target, not text that is merely
    // weird.)
    val docs = ((0 until 20).map(i =>
        (i.toLong, s"the cat sat on the mat number$i", if (i < 5) "en" else "xx")) ++
      (20 until 40).map(i =>
        (i.toLong, "zz qq ww kk jj ff", "xx"))).toDF("doc_id", "text", "lang")
    val k = 15
    val kept = Sampling.dsirSelect(docs, "doc_id", "text",
        col("lang") === "en", k, buckets = 4096)
      .collect().map(_.getLong(0)).toSet
    assert(kept.size === k)
    // the exact top-k must match a full-rank reference computed from
    // the weights themselves
    val ref = Sampling.dsirWeightsHashed(docs, "doc_id", "text",
        col("lang") === "en", buckets = 4096)
      .filter(col("lw").isNotNull)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, lw) => (-lw, id) }.take(k).map(_._1).toSet
    assert(kept === ref)
    // and it prefers the target-like population
    assert(kept.count(_ < 20) > kept.count(_ >= 20))
    // quantile form: kept fraction ≈ keepFraction; high overlap with
    // the exact top of the same size
    // threshold selection keeps AT LEAST the requested fraction and
    // over-keeps only by finishing a tied plateau at the cutoff (the
    // inherent indifference zone of threshold vs rank selection: 15
    // structurally-identical docs here share one weight)
    val q = Sampling.dsirSelectQuantile(docs, "doc_id", "text",
        col("lang") === "en", keepFraction = 0.375, buckets = 4096)
      .collect().map(_.getLong(0)).toSet
    assert(q.size >= 15 && q.size <= 20, s"kept ${q.size} of 40 at p=0.375")
    assert((q & ref).size >= (ref.size * 0.8).toInt,
      s"quantile selection diverged from exact: ${(q & ref).size}/${ref.size}")
    // and nothing below the cutoff sneaks in: every kept doc weighs
    // at least as much as every dropped doc
    val weights = Sampling.dsirWeightsHashed(docs, "doc_id", "text",
        col("lang") === "en", buckets = 4096)
      .filter(col("lw").isNotNull)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val minKept = q.map(weights).min
    val dropped = weights.keySet -- q
    assert(dropped.forall(weights(_) <= minKept))
  }

  test("DSIR weights stay defined when the target slice is empty") {
    // a filter matching nothing must not throw or produce NaN: the
    // target model is empty, every bigram smooths to the uniform
    // floor, and weights are finite (just uninformative)
    val df = Seq((1L, "the cat sat"), (2L, "on the mat"), (3L, "x"))
      .toDF("doc_id", "text").withColumn("lang", lit("xx"))
    for (got <- Seq(
        Sampling.dsirWeights(df, "doc_id", "text", col("lang") === "en"),
        Sampling.dsirWeightsHashed(df, "doc_id", "text",
          col("lang") === "en", buckets = 64))) {
      val rows = got.orderBy("doc_id")
        .as[(Long, Option[Double], Long)].collect().toSeq
      assert(rows.map(_._1) === Seq(1L, 2L, 3L))
      rows.take(2).foreach { r =>
        assert(r._2.isDefined && !r._2.get.isNaN && !r._2.get.isInfinite, r)
      }
      assert(rows(2) === ((3L, None, 0L)))
    }
  }

  test("dsirWeightsHashed up-weights target-like docs, same contract as exact") {
    val df = Seq(
      (1L, "the cat sat on the mat", "en"),
      (2L, "the cat ran to the mat", "en"),
      (3L, "the cat sat on the rug", "xx"),
      (4L, "zzz qqq www kkk jjj fff", "xx"),
      (5L, "one", "xx")).toDF("doc_id", "text", "lang")
    val got = Sampling.dsirWeightsHashed(df, "doc_id", "text",
        col("lang") === "en", buckets = 4096)
      .orderBy("doc_id").as[(Long, Option[Double], Long)].collect().toSeq
    val lw = got.map(r => r._1 -> r._2).toMap
    assert(lw(3L).get > lw(4L).get,
      s"target-like ${lw(3L)} must beat outlier ${lw(4L)}")
    assert(got(4) === ((5L, None, 0L)))
    got.flatMap(_._2).foreach(w => assert(!w.isNaN && !w.isInfinite))
  }

  test("planMixture: water-filling conserves the budget and respects caps") {
    val ps = Seq(
      ("tiny", 100.0, 1.0),    // cap 150, r 150  → capped
      ("smallhot", 200.0, 4.0), // cap 300, r 75  → capped (hot weight)
      ("mid", 1000.0, 1.0),    // cap 1500
      ("big", 5000.0, 1.0))    // cap 7500
      .toDF("source", "n_tokens", "weight")
    val got = Sampling.planMixture(ps, "source", "n_tokens", "weight",
        budget = 3000.0, maxEpochs = 1.5)
      .collect().map(r => r.getString(0) -> ((r.getDouble(4), r.getDouble(5)))).toMap
    // Σ alloc = budget (uncapped absorb the capped sources' excess)
    assert(math.abs(got.values.map(_._1).sum - 3000.0) < 1e-6)
    // capped sources pin at exactly maxEpochs
    assert(math.abs(got("tiny")._2 - 1.5) < 1e-9)
    assert(math.abs(got("smallhot")._2 - 1.5) < 1e-9)
    // uncapped allocs are proportional to weight: same λ = alloc/w
    val lamMid = got("mid")._1 / 1.0
    val lamBig = got("big")._1 / 1.0
    assert(math.abs(lamMid - lamBig) < 1e-6)
    // no source exceeds its cap
    assert(got("mid")._1 <= 1500.0 + 1e-9 && got("big")._1 <= 7500.0 + 1e-9)
  }

  test("planMixture: budget above total capacity caps everything") {
    val ps = Seq(("a", 100.0, 1.0), ("b", 300.0, 2.0))
      .toDF("source", "n_tokens", "weight")
    val got = Sampling.planMixture(ps, "source", "n_tokens", "weight",
        budget = 1e9, maxEpochs = 2.0)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(got === Map("a" -> 200.0, "b" -> 600.0))
  }

  test("planMixture: tight budget caps nothing, allocs follow weights") {
    val ps = Seq(("a", 1000.0, 1.0), ("b", 1000.0, 3.0))
      .toDF("source", "n_tokens", "weight")
    val got = Sampling.planMixture(ps, "source", "n_tokens", "weight",
        budget = 400.0, maxEpochs = 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(math.abs(got("a") - 100.0) < 1e-9)
    assert(math.abs(got("b") - 300.0) < 1e-9)
  }

  test("qualityCap equals the window-rank reference on any partitioning") {
    import org.apache.spark.sql.expressions.Window
    val score = round(TextAnalysis.qualityScore(col("text")), 6)
    val reference = docs
      .withColumn("_q", score)
      .withColumn("_rk", row_number().over(
        Window.partitionBy("source").orderBy(col("_q").desc, col("doc_id"))))
      .filter(col("_rk") <= 7)
      .select(col("source"), col("doc_id"), col("_q").as("score"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    for (d <- Seq(docs, docs.repartition(13))) {
      val got = Sampling.qualityCap(d, "source", "doc_id", score, 7)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === reference)
    }
  }

  test("qualityCap plan is a bounded aggregate, not a window sort") {
    val score = round(TextAnalysis.qualityScore(col("text")), 6)
    val plan = Sampling.qualityCap(docs, "source", "doc_id", score, 5)
      .queryExecution.executedPlan.toString
    // partial+final ObjectHashAggregate (the TypedImperativeAggregate
    // path with map-side combine); no per-row window rank anywhere
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Sort ["), plan)
  }

  test("qualityCap keeps whole groups smaller than k; ties fall to lower ids") {
    val tiny = Seq(
      ("a", 1L, 0.5), ("a", 2L, 0.5), ("a", 3L, 0.5), ("b", 4L, 0.9))
      .toDF("g", "id", "s")
    val got = Sampling.qualityCap(tiny, "g", "id", col("s"), 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("a", 1L), ("a", 2L), ("b", 4L)))
    val rows = Sampling.qualityCapRows(tiny, "g", "id", col("s"), 2)
    assert(rows.columns.toSeq === Seq("g", "id", "s"))
    assert(rows.select("id").collect().map(_.getLong(0)).toSet ===
      Set(1L, 2L, 4L))
  }

  test("splitLeakage counts content clusters straddling the id-hash split") {
    import org.apache.spark.sql.functions.col
    // Recover which ids the 80% id-hash split sends where, then plant
    // duplicates that provably straddle (one train id + one test id).
    val ids = (1L to 200L).toDF("id")
      .withColumn("is_train", Sampling.hashPercentile(col("id")) < 80)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val train = ids.collect { case (k, true) => k }.toSeq.sorted
    val test = ids.collect { case (k, false) => k }.toSeq.sorted
    assert(train.size >= 3 && test.size >= 3)

    // 2 straddling clusters, 1 train-only duplicate pair, 1 test-only
    // duplicate pair, 2 singletons (one per side).
    val docs = Seq(
      (train(0), "dupA"), (test(0), "dupA"),
      (train(1), "dupB"), (test(1), "dupB"),
      (train(2), "trainOnly"), (train(3), "trainOnly"),
      (test(2), "testOnly"), (test(3), "testOnly"),
      (train(4), "solo1"), (test(4), "solo2"))
      .toDF("doc_id", "text")
    val r = Sampling.splitLeakage(docs, "text", "doc_id", 80).collect()(0)
    assert(r.getLong(0) === 6L)               // content groups
    assert(r.getLong(1) === 2L)               // straddling groups
    assert(r.getLong(2) === 5L)               // test docs total
    assert(r.getLong(3) === 2L)               // contaminated test docs
    assert(r.getDouble(4) === 0.4)

    // Splitting by CONTENT instead of id cannot leak by construction.
    val byContent = docs.withColumn("key", col("text"))
    val r2 = Sampling.splitLeakage(byContent, "text", "key", 80).collect()(0)
    assert(r2.getLong(1) === 0L && r2.getLong(3) === 0L)
  }
}
