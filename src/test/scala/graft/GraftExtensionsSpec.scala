package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Exercises the SQL surface registered by GraftExtensions on a
  * session of its own (getOrCreate only applies extensions to a
  * genuinely new session, hence the clear/restore dance).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private def withExtendedSession[T](f: SparkSession => T): T = {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      // subset co-partitioning ON (r15): the persisted indexes are
      // bucketed on ONE key (bkey/cell/id/src) while some probe joins
      // carry extra equi-keys; with the Spark default (true) the
      // planner refuses the single-key co-partition and RESHUFFLES the
      // bucketed index side on every probe (caught by the r15 real
      // plan walk - the old inputPlan-based spec was vacuous)
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
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

  test("graft_dot callable from SQL") {
    withExtendedSession { s =>
      val v = s.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .head().getDouble(0)
      assert(v == 11.0)
    }
  }

  test("graft_topk aggregates from SQL") {
    withExtendedSession { s =>
      val rows = s.sql(
        """SELECT g, graft_topk(score, id, 2) AS top FROM VALUES
          |  (1, 0.9d, 10L), (1, 0.99d, 4L), (1, 0.5d, 3L), (2, 0.1d, 1L)
          |  AS t(g, score, id)
          |GROUP BY g ORDER BY g""".stripMargin).collect()
      val g1 = rows(0).getSeq[org.apache.spark.sql.Row](1)
      assert(g1.map(r => (r.getDouble(0), r.getLong(1))) == Seq((0.99, 4L), (0.9, 10L)))
      assert(rows(1).getSeq[org.apache.spark.sql.Row](1).length == 1)
    }
  }

  test("graft_sorted_intersect callable from SQL") {
    withExtendedSession { s =>
      val v = s.sql(
        "SELECT graft_sorted_intersect(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS c")
        .head().getInt(0)
      assert(v == 2)
    }
  }

  test("graft_pack_int8 / graft_binary_dot round-trip from SQL") {
    withExtendedSession { s =>
      val r = s.sql(
        """SELECT graft_binary_dot(graft_pack_int8(array(1L, -2L, 300L)),
          |                        graft_pack_int8(array(2L, 2L, 1L))) AS d,
          |       length(graft_pack_int8(array(1L, 2L, 3L, 4L))) AS n""".stripMargin)
        .head()
      // 1*2 + (-2)*2 + clamp(300→127)*1 = 125; 4 values pack to 4 bytes
      assert(r.getDouble(0) == 125.0 && r.getInt(1) == 4)
    }
  }

  test("graft_concat_excluding callable from SQL") {
    withExtendedSession { s =>
      val v = s.sql(
        "SELECT graft_concat_excluding(array('a','b','c','d'), array(1, 3)) AS t")
        .head().getString(0)
      assert(v == "a c")
    }
  }

  test("graft_greedy_chunks callable from SQL") {
    withExtendedSession { s =>
      val v = s.sql(
        "SELECT graft_greedy_chunks(array(3L, 3L, 3L, 7L, 2L), 6L) AS c")
        .head().getSeq[Long](0)
      // [3,3]=6 | [3]=3 (+7 would overflow) | [7] alone | [2]
      assert(v == Seq(0L, 0L, 1L, 2L, 3L))
    }
  }
}
