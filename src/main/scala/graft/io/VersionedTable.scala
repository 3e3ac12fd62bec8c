package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.hadoop.fs.Path

/** Snapshot-isolated VERSIONED parquet tables (r13) — the open-table-
  * format core (Delta/Iceberg-style) from plain primitives, closing
  * the lifecycle gap the write-then-swap tables have: a swap is
  * crash-safe but a reader holding the old incarnation mid-swap is
  * not isolated, and time travel was SCD2-only (row-level, one
  * schema). Here:
  *
  *   - every commit writes an IMMUTABLE data directory `v<n>/` under
  *     the table root, then publishes a tiny manifest file
  *     `_versions/<n>` via write-temp + atomic rename — the manifest
  *     is the ONLY visibility gate, so a crash between data write
  *     and publish leaves an invisible orphan (cleaned by vacuum),
  *     never a torn table;
  *   - READERS resolve the manifest once at DataFrame construction
  *     and scan only that version's directory: a concurrent commit
  *     changes what NEW readers see, never what a live reader is
  *     scanning (snapshot isolation by immutability — the Iceberg
  *     argument);
  *   - TIME TRAVEL is `read(spark, root, asOf = Some(v))`; `history`
  *     lists every committed version; `rollback` is Delta-RESTORE
  *     shaped: a NEW version whose manifest points at the old
  *     version's data directory (history is never rewritten);
  *   - `vacuum` deletes data directories no kept manifest references
  *     (old versions past the retention window + crash orphans).
  *
  * Writer concurrency: [[commit]] is the single-writer fast path
  * (`v<n>` data dirs, publish must win). [[commitConcurrent]] is the
  * multi-writer path — the minimal core of the lake-format log
  * protocol (Delta's mutual-exclusion-on-log-entry argument): each
  * attempt writes its data under an attempt-UNIQUE directory (two
  * racing writers can never clobber each other's files), then tries
  * to publish manifest `n = current + 1` via an ATOMIC
  * create-if-absent (hard link on the local scheme — EEXIST is
  * kernel-arbitrated; no-overwrite rename on HDFS — the namenode
  * arbitrates); the loser re-reads the log and retries with the next
  * number. Data is written once; only the tiny manifest publish
  * retries.
  */
object VersionedTable {

  /** One manifest entry. `dataDir` is root-relative. */
  case class Version(version: Long, dataDir: String, nRows: Long,
                     action: String)

  private def fsOf(spark: SparkSession, root: String) = {
    val p = new Path(root)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def manifestDir(root: Path) = new Path(root, "_versions")

  /** Parse one manifest file (a single JSON object). */
  private def parseManifest(s: String): Version = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val JObject(fields) = JsonMethods.parse(s): @unchecked
    val m = fields.toMap
    def long(v: JValue): Long = v match {
      case JInt(i) => i.toLong; case JLong(l) => l
      case other => throw new IllegalArgumentException(s"not a long: $other")
    }
    def str(v: JValue): String = v.asInstanceOf[JString].s
    Version(long(m("version")), str(m("data_dir")), long(m("n_rows")),
      str(m("action")))
  }

  private def renderManifest(v: Version): String =
    s"""{"version": ${v.version}, "data_dir": "${v.dataDir}", """ +
      s""""n_rows": ${v.nRows}, "action": "${v.action}"}"""

  /** All committed versions, ascending. */
  def versions(spark: SparkSession, root: String): Seq[Version] = {
    val (fs, rootPath) = fsOf(spark, root)
    val md = manifestDir(rootPath)
    if (!fs.exists(md)) return Seq.empty
    fs.listStatus(md).toSeq
      .filter(s => s.isFile && s.getPath.getName.forall(_.isDigit))
      .map { s =>
        val in = fs.open(s.getPath)
        try parseManifest(new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8))
        finally in.close()
      }
      .sortBy(_.version)
  }

  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    // the maximum is decided by manifest FILE NAMES alone — no
    // manifest is opened or parsed, so the publish-retry loop costs
    // one directory listing per attempt, not O(versions) reads
    val (fs, rootPath) = fsOf(spark, root)
    val md = manifestDir(rootPath)
    if (!fs.exists(md)) return None
    val names = fs.listStatus(md).toSeq
      .filter(s => s.isFile && s.getPath.getName.forall(_.isDigit) &&
        s.getPath.getName.nonEmpty)
      .map(_.getPath.getName.toLong)
    if (names.isEmpty) None else Some(names.max)
  }

  /** Commit `df` as the next version. Returns the new version number.
    * Crash-safe: the data directory is fully written (and counted)
    * BEFORE the manifest publishes via temp-write + atomic rename;
    * a retry of a failed commit rewrites the same unpublished
    * directory with overwrite semantics.
    */
  def commit(df: DataFrame, root: String,
             action: String = "commit"): Long = {
    val spark = df.sparkSession
    val (fs, rootPath) = fsOf(spark, root)
    val next = currentVersion(spark, root).getOrElse(0L) + 1
    val dataDir = s"v$next"
    df.write.mode(SaveMode.Overwrite)
      .parquet(new Path(rootPath, dataDir).toString)
    val n = spark.read.parquet(new Path(rootPath, dataDir).toString).count()
    publish(fs, rootPath, Version(next, dataDir, n, action))
    next
  }

  private def publish(fs: org.apache.hadoop.fs.FileSystem, rootPath: Path,
                      v: Version): Unit =
    require(publishIfAbsent(fs, rootPath, v),
      s"could not publish manifest for v${v.version} under $rootPath — " +
        "another writer holds this version (use commitConcurrent for " +
        "multi-writer tables)")

  /** Conditionally publish `v`'s manifest: true iff THIS caller
    * created `_versions/<n>` — the multi-writer arbitration point.
    * The manifest is fully written to a writer-unique temp file
    * first (so the published file is never torn), then moved to the
    * final name with an atomic create-if-absent:
    *   - local scheme: a POSIX hard link — the kernel returns EEXIST
    *     to exactly one loser, no TOCTOU window;
    *   - other stores (HDFS): `rename` without overwrite — atomic at
    *     the namenode, false when the destination exists.
    */
  private[io] def publishIfAbsent(fs: org.apache.hadoop.fs.FileSystem,
                                  rootPath: Path, v: Version): Boolean = {
    val md = manifestDir(rootPath)
    fs.mkdirs(md)
    val token = java.util.UUID.randomUUID().toString.replace("-", "")
    val tmp = new Path(md, s".${v.version}.$token.tmp")
    val out = fs.create(tmp, true)
    try out.write(renderManifest(v)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val fin = new Path(md, v.version.toString)
    def renamePublish(): Boolean = {
      // HDFS rename is atomic and fails when the destination exists;
      // a store whose rename overwrites must go through a locking
      // layer — documented contract
      val ok = fs.rename(tmp, fin)
      if (!ok) fs.delete(tmp, false)
      ok
    }
    if (fs.getScheme == "file") {
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(fin.toUri.getPath),
          java.nio.file.Paths.get(tmp.toUri.getPath))
        fs.delete(tmp, false)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          fs.delete(tmp, false); false
        case _: java.io.IOException =>
          // a file:// mount without hard-link support (FAT/some
          // FUSE): keep the pre-r14 rename publish rather than
          // failing every commit — weaker arbitration, same as any
          // overwriting-rename store
          renamePublish()
      }
    } else renamePublish()
  }

  /** MULTI-WRITER commit (optimistic concurrency — the lake-format
    * log protocol's minimal core): write the data ONCE under an
    * attempt-unique immutable directory, then loop { read the log's
    * tail, try to publish manifest `current + 1` via the atomic
    * create-if-absent of [[publishIfAbsent]] }; the loser of a race
    * re-reads and retries with the next number. Any number of
    * concurrent committers serialize into a contiguous version
    * sequence with no lost updates and no torn state — data
    * directories never collide (unique names) and the manifest
    * create is kernel/namenode-arbitrated. Returns the committed
    * version number.
    */
  def commitConcurrent(df: DataFrame, root: String,
                       action: String = "commit",
                       maxAttempts: Int = 64): Long = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1: $maxAttempts")
    val spark = df.sparkSession
    val (fs, rootPath) = fsOf(spark, root)
    // the FULL UUID (128 bits, dashes stripped) names the attempt dir:
    // an 8-hex token is a 32-bit space, so over a table's lifetime a
    // collision with some PREVIOUSLY published version reaches ~50%
    // odds by ~77k commits — and an Overwrite write into a collided
    // name would silently corrupt that version's immutable data while
    // its manifest still points there. Belt-and-braces: the write is
    // ErrorIfExists, so even an impossible collision aborts THIS
    // attempt instead of rewriting published history.
    val token = java.util.UUID.randomUUID().toString.replace("-", "")
    val dataDir = s"d$token"
    df.write.mode(SaveMode.ErrorIfExists)
      .parquet(new Path(rootPath, dataDir).toString)
    val n = spark.read.parquet(new Path(rootPath, dataDir).toString).count()
    var attempt = 0
    while (attempt < maxAttempts) {
      val next = currentVersion(spark, root).getOrElse(0L) + 1
      if (publishIfAbsent(fs, rootPath, Version(next, dataDir, n, action)))
        return next
      attempt += 1
    }
    // surface the contention instead of spinning forever; the data
    // dir is an orphan vacuum() will collect
    throw new IllegalStateException(
      s"commitConcurrent lost $maxAttempts straight version races under " +
        s"$root — pathological contention, data left unpublished at $dataDir")
  }

  /** Read the table at its current version, or at `asOf`. The version
    * is resolved HERE, once: the returned DataFrame scans that
    * version's immutable directory no matter what commits later
    * (snapshot isolation).
    */
  def read(spark: SparkSession, root: String,
           asOf: Option[Long] = None): DataFrame = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no committed versions under $root")
    val v = asOf match {
      case None => vs.last
      case Some(n) => vs.find(_.version == n).getOrElse(
        throw new IllegalArgumentException(
          s"version $n not found under $root (have ${vs.map(_.version)})"))
    }
    spark.read.parquet(new Path(new Path(root), v.dataDir).toString)
  }

  /** The commit log as a DataFrame: (version, data_dir, n_rows, action). */
  def history(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    versions(spark, root)
      .map(v => (v.version, v.dataDir, v.nRows, v.action))
      .toDF("version", "data_dir", "n_rows", "action")
  }

  /** Delta-RESTORE-shaped rollback: a NEW version pointing at version
    * `to`'s data directory — history is append-only, time travel to
    * the rolled-back-over versions keeps working.
    */
  def rollback(spark: SparkSession, root: String, to: Long): Long = {
    val vs = versions(spark, root)
    val target = vs.find(_.version == to).getOrElse(
      throw new IllegalArgumentException(s"version $to not found under $root"))
    val (fs, rootPath) = fsOf(spark, root)
    val next = vs.last.version + 1
    publish(fs, rootPath,
      Version(next, target.dataDir, target.nRows, s"rollback_to_v$to"))
    next
  }

  /** Delete data directories not referenced by the newest `keepLast`
    * manifests (older manifests are dropped too) and any orphan data
    * directory no manifest ever published (a crashed commit).
    * Returns the number of directories deleted. The current version
    * is always kept. Like real lake formats, vacuum racing an
    * IN-FLIGHT commit can collect data the commit is about to
    * publish — run vacuum from the table owner, not concurrently
    * with writers (the retention-window contract).
    */
  def vacuum(spark: SparkSession, root: String, keepLast: Int): Int = {
    require(keepLast >= 1, "must keep at least the current version")
    val (fs, rootPath) = fsOf(spark, root)
    val vs = versions(spark, root)
    if (vs.isEmpty) return 0
    val kept = vs.takeRight(keepLast)
    val keptDirs = kept.map(_.dataDir).toSet
    // drop old manifests first: a reader can no longer resolve a
    // version whose data is about to disappear
    val md = manifestDir(rootPath)
    vs.dropRight(keepLast).foreach(v =>
      fs.delete(new Path(md, v.version.toString), false))
    var deleted = 0
    fs.listStatus(rootPath).foreach { s =>
      val n = s.getPath.getName
      // v<digits>: single-writer commit dirs; d<hex>: concurrent-
      // commit attempt dirs (published or orphaned by a lost race) —
      // 32 hex chars since the full-UUID naming, 8 for dirs written
      // by the pre-r15 token scheme (still collectable)
      val isDataDir =
        (n.startsWith("v") && n.length > 1 && n.drop(1).forall(_.isDigit)) ||
        (n.startsWith("d") && (n.length == 9 || n.length == 33) &&
          n.drop(1).forall(c => c.isDigit || ('a' to 'f').contains(c)))
      if (s.isDirectory && isDataDir && !keptDirs.contains(n)) {
        fs.delete(s.getPath, true)
        deleted += 1
      }
    }
    deleted
  }
}
