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
}
