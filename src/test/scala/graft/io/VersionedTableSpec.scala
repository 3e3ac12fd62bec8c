package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Snapshot-isolated versioned tables (r13): commit/read/time-travel
  * semantics, reader isolation under concurrent commits, append-only
  * rollback, crash-orphan invisibility, and vacuum retention.
  */
class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() =
    java.nio.file.Files.createTempDirectory("graft-vt").toString

  private def t(rows: (Long, String)*) = rows.toSeq.toDF("k", "v")

  test("commit / read / history: versions ascend, counts recorded") {
    val root = newRoot()
    assert(VersionedTable.currentVersion(spark, root).isEmpty)
    val v1 = VersionedTable.commit(t(1L -> "a", 2L -> "b"), root, "initial")
    val v2 = VersionedTable.commit(t(1L -> "a", 2L -> "b2", 3L -> "c"), root)
    assert((v1, v2) == (1L, 2L))
    assert(VersionedTable.read(spark, root).count() == 3)
    val h = VersionedTable.history(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(h.toSeq == Seq((1L, 2L, "initial"), (2L, 3L, "commit")))
  }

  test("snapshot isolation: a live reader keeps its version across a commit") {
    val root = newRoot()
    VersionedTable.commit(t(1L -> "old"), root)
    val reader = VersionedTable.read(spark, root) // resolves v1 NOW
    VersionedTable.commit(t(1L -> "new", 2L -> "more"), root)
    assert(reader.collect().map(_.getString(1)).toSeq == Seq("old"),
      "the pre-commit reader must still scan v1's immutable directory")
    assert(VersionedTable.read(spark, root).count() == 2,
      "a NEW reader sees the new version")
  }

  test("time travel: asOf reads every committed version; unknown version fails") {
    val root = newRoot()
    VersionedTable.commit(t(1L -> "a"), root)
    VersionedTable.commit(t(1L -> "a", 2L -> "b"), root)
    assert(VersionedTable.read(spark, root, Some(1L)).count() == 1)
    assert(VersionedTable.read(spark, root, Some(2L)).count() == 2)
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, root, Some(9L))
    }
  }

  test("rollback is append-only RESTORE: new version, old data, history intact") {
    val root = newRoot()
    VersionedTable.commit(t(1L -> "keep"), root)
    VersionedTable.commit(t(1L -> "bad", 2L -> "worse"), root)
    val v3 = VersionedTable.rollback(spark, root, 1L)
    assert(v3 == 3L)
    assert(VersionedTable.read(spark, root).collect()
      .map(_.getString(1)).toSeq == Seq("keep"))
    // the rolled-over version is still time-travelable
    assert(VersionedTable.read(spark, root, Some(2L)).count() == 2)
    assert(VersionedTable.history(spark, root).count() == 3)
  }

  test("a crashed commit's orphan directory is invisible and vacuumed") {
    val root = newRoot()
    VersionedTable.commit(t(1L -> "a"), root)
    // simulate: data written, manifest never published
    t(9L -> "orphan").write.parquet(s"$root/v2")
    assert(VersionedTable.currentVersion(spark, root).contains(1L))
    assert(VersionedTable.read(spark, root).count() == 1)
    val deleted = VersionedTable.vacuum(spark, root, keepLast = 5)
    assert(deleted == 1, "the orphan must be vacuumed")
    assert(!new java.io.File(s"$root/v2").exists())
  }

  test("vacuum retention: old versions drop, current stays readable") {
    val root = newRoot()
    (1 to 4).foreach(i => VersionedTable.commit(t(i.toLong -> s"v$i"), root))
    val deleted = VersionedTable.vacuum(spark, root, keepLast = 2)
    assert(deleted == 2)
    assert(VersionedTable.read(spark, root).collect()
      .map(_.getString(1)).toSeq == Seq("v4"))
    assert(VersionedTable.read(spark, root, Some(3L)).count() == 1)
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, root, Some(1L)) // vacuumed away
    }
    assert(VersionedTable.history(spark, root)
      .collect().map(_.getLong(0)).toSeq == Seq(3L, 4L))
  }

  test("commitConcurrent: racing writers serialize into contiguous versions") {
    val root = newRoot()
    VersionedTable.commit(t(0L -> "base"), root)
    // 8 concurrent committers, each with distinguishable content
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val futures = (1 to 8).map { i =>
        scala.concurrent.Future(
          VersionedTable.commitConcurrent(
            t(i.toLong -> s"writer$i"), root, s"w$i"))
      }
      val got = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures),
        scala.concurrent.duration.Duration(120, "s"))
      // every writer won SOME version; versions are distinct and
      // contiguous 2..9 — no lost update, no gap
      assert(got.sorted == (2L to 9L), s"got $got")
    } finally pool.shutdown()
    val h = VersionedTable.history(spark, root).collect()
      .map(r => (r.getLong(0), r.getString(3))).toSeq
    assert(h.map(_._1) == (1L to 9L))
    // each version's data is intact and attributable to its writer
    val actions = h.filter(_._1 >= 2).map(_._2).toSet
    assert(actions == (1 to 8).map(i => s"w$i").toSet)
    for ((v, action) <- h if v >= 2) {
      val rows = VersionedTable.read(spark, root, Some(v)).collect()
      assert(rows.map(_.getString(1)).toSeq == Seq(s"writer${action.drop(1)}"))
    }
  }

  test("publishIfAbsent: exactly one writer wins a version; the loser's tmp never lands") {
    val root = newRoot()
    val v1 = VersionedTable.commitConcurrent(t(1L -> "only"), root)
    assert(v1 == 1L)
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the arbitration primitive, head-to-head on the same number: the
    // first create-if-absent wins, the second must see false (a torn
    // overwrite would return true twice)
    val win = VersionedTable.publishIfAbsent(fs, rootPath,
      VersionedTable.Version(2L, "d00000001", 1L, "w_a"))
    val lose = VersionedTable.publishIfAbsent(fs, rootPath,
      VersionedTable.Version(2L, "d00000002", 1L, "w_b"))
    assert(win && !lose)
    // the winner's manifest content is intact (the loser did not
    // half-overwrite it) and no .tmp litter remains
    val vs = VersionedTable.versions(spark, root)
    assert(vs.map(v => (v.version, v.action)) == Seq((1L, "commit"), (2L, "w_a")))
    val tmps = fs.listStatus(new org.apache.hadoop.fs.Path(root, "_versions"))
      .map(_.getPath.getName).filter(_.endsWith(".tmp"))
    assert(tmps.isEmpty, s"tmp litter: ${tmps.toSeq}")
    // a commitConcurrent after the contention lands past it
    val v3 = VersionedTable.commitConcurrent(t(3L -> "winner"), root)
    assert(v3 == 3L)
    assert(VersionedTable.read(spark, root, Some(3L)).collect()
      .map(_.getString(1)).toSeq == Seq("winner"))
  }
}
