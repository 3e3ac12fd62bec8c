package graft.plans

import graft.GraftExtensions
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class LevenshteinPrefilterSpec extends AnyFunSuite {

  private def withExtendedSession[T](f: SparkSession => T): T = {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-lev-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try f(s)
    finally {
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }

  test("length guard is injected in front of a bounded levenshtein predicate") {
    withExtendedSession { s =>
      // parquet source: a LocalRelation would be constant-folded away
      val part = s.read.parquet("/root/testdata/sf0.001/part.parquet")
      val df = part.filter("levenshtein(p_name, 'red bolt') <= 2")
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("abs((length(p_name"), optimized)
      // additive rewrite: no true matches are lost
      val expected = part.selectExpr("levenshtein(p_name, 'red bolt') AS d")
        .where("d <= 2").count()
      assert(df.count() == expected && expected > 0)
    }
  }

  test("rule is idempotent (re-optimizing does not stack guards)") {
    withExtendedSession { s =>
      import s.implicits._
      val df = Seq(("x", "y")).toDF("a", "b").filter("levenshtein(a, b) < 3")
      val once = df.queryExecution.optimizedPlan
      val twice = LevenshteinPrefilterRule(once)
      assert(once.toString == twice.toString)
    }
  }

  test("unbounded levenshtein expressions are left alone") {
    withExtendedSession { s =>
      import s.implicits._
      val df = Seq(("abc", "abd")).toDF("a", "b")
        .selectExpr("levenshtein(a, b) AS d")
      assert(!df.queryExecution.optimizedPlan.toString.contains("abs("))
      assert(df.head.getInt(0) == 1)
    }
  }
}
