package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink helpers: multi-format IO and bucketed tables.
  *
  * Bucketing is the 100 TB co-location tool: two tables bucketed by
  * the same key into the same bucket count join WITHOUT a shuffle —
  * the exchange happens once at write time instead of on every query.
  */
object Sources {

  val Formats: Seq[String] = Seq("parquet", "orc", "json", "csv")

  /** Write in any supported format (csv gets a header). */
  def write(df: DataFrame, path: String, format: String,
            mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode).format(format)
    (if (format == "csv") w.option("header", "true") else w).save(path)
  }

  /** Read any supported format; csv/json take an explicit schema so
    * types round-trip exactly (inference is a correctness trap).
    */
  def read(spark: SparkSession, path: String, format: String,
           schema: Option[StructType] = None): DataFrame = {
    var r = spark.read.format(format)
    schema.foreach(s => r = r.schema(s))
    if (format == "csv") r = r.option("header", "true")
    r.load(path)
  }

  /** Write as a bucketed managed table (co-located by `bucketCol`).
    * Drops any previous incarnation first, INCLUDING a stale
    * warehouse directory left by a prior session: the default
    * in-memory catalog forgets its tables on restart but the
    * warehouse dir persists, and `saveAsTable(Overwrite)` then fails
    * with LOCATION_ALREADY_EXISTS instead of overwriting.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Append to an EXISTING bucketed table written by `writeBucketed`
    * — the delta-ingest path for persisted indexes: new rows land in
    * the same bucket layout (Spark validates the bucket spec against
    * the catalog), so readers keep their exchange-free joins while
    * the index grows file-by-file instead of being rebuilt.
    */
  def appendBucketed(df: DataFrame, table: String, bucketCol: String,
                     buckets: Int): Unit =
    df.write.mode(SaveMode.Append)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Bucket count of a bucketed catalog table (None if unbucketed). */
  def numBuckets(spark: SparkSession, table: String): Option[Int] = {
    import org.apache.spark.sql.functions.col
    spark.sql(s"DESCRIBE EXTENDED `$table`")
      .filter(col("col_name") === "Num Buckets")
      .collect().headOption.map(_.getString(1).trim.toInt)
  }

  /** Compact a bucketed table in place down to ONE file per bucket,
    * WITHOUT a shuffle.
    *
    * Every `appendBucketed` delta adds a file per (write task,
    * bucket); after months of daily appends a bucket is hundreds of
    * small files and every probe pays their open/footer cost. The
    * rewrite forces a BUCKETED scan of the source (autoBucketedScan
    * off — by default the planner both disables the bucketed read
    * for a scan with no join to feed AND drops any explicit
    * repartition as "redundant" against the catalog bucket spec,
    * leaving misaligned file-split partitions), so each read task
    * holds exactly one bucket's rows end-to-end and the bucketed
    * write emits exactly one file per bucket: a pure per-bucket file
    * merge, no exchange at any scale. The fresh table is written
    * COMPLETELY before the old one is dropped and the new one renamed
    * in (a crash before the swap leaves the original intact); readers
    * mid-query during the swap are not protected — this is a
    * single-writer maintenance operation. Bucket count, sort order,
    * and therefore every exchange-free probe plan are unchanged
    * (spec'd: probe results identical before/after, file count drops
    * to ≤ buckets).
    */
  def compactBucketed(spark: SparkSession, table: String,
                      bucketCol: String): Unit = {
    val buckets = numBuckets(spark, table).getOrElse(
      throw new IllegalArgumentException(s"$table is not bucketed"))
    val tmp = s"${table}__compact"
    val old = s"${table}__old"
    val scanConf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prior = spark.conf.get(scanConf)
    try {
      spark.conf.set(scanConf, "false")
      writeBucketed(spark.table(table), tmp, bucketCol, buckets)
    } finally spark.conf.set(scanConf, prior)
    // Swap via rename-rename-drop, not drop-then-rename: a crash
    // between any two statements leaves BOTH copies on disk under
    // recoverable names — drop-first would lose the table name (and
    // with it the catalog's bucket spec) until a manual rename.
    spark.sql(s"DROP TABLE IF EXISTS `$old`")
    spark.sql(s"ALTER TABLE `$table` RENAME TO `$old`")
    spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
    spark.sql(s"DROP TABLE `$old`")
  }

  /** Compact a directory-partitioned parquet SINK (e.g. a streaming
    * foreachBatch sink's `root/batch_id=<id>/` directories, one per
    * micro-batch) down to one file per partition directory (r13):
    * long-running streams accumulate a directory per micro-batch,
    * each holding one file per writing task, and small-file count —
    * not data volume — becomes the read-side cost. Shuffle-free: each
    * partition directory is read and `coalesce(1)`-rewritten
    * independently (a narrow dependency; no exchange anywhere), so
    * compaction cost is one pass over the sink, partition by
    * partition. Replayed reads are row-identical: the directory name
    * (the partition column) and row contents are untouched.
    *
    * Crash-safe by the compactBucketed rename discipline — write to a
    * `_`-prefixed temp dir (hidden from Spark/Hadoop readers, so a
    * crash mid-compaction never corrupts the partition-value parse of
    * the root), rename-rename-delete. Skips directories already at
    * one data file; returns the number of directories compacted.
    */
  def compactPartitionedDir(spark: SparkSession, root: String): Int = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return 0
    val parts = fs.listStatus(rootPath)
      .filter(s => s.isDirectory && s.getPath.getName.contains("=") &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
    var compacted = 0
    parts.foreach { p =>
      val dir = p.getPath
      val dataFiles = fs.listStatus(dir).filter { f =>
        val n = f.getPath.getName
        f.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      if (dataFiles.length > 1) {
        // temp names carry NO '=': partition discovery parses any
        // `name=value` directory as a partition column (even
        // underscore-prefixed), so a crash leftover with '=' would
        // poison the root's partition inference
        val safe = dir.getName.replace('=', '.')
        val tmp = new org.apache.hadoop.fs.Path(dir.getParent,
          s"_compact_$safe")
        val old = new org.apache.hadoop.fs.Path(dir.getParent,
          s"_old_$safe")
        spark.read.parquet(dir.toString).coalesce(1)
          .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        fs.delete(old, true)
        require(fs.rename(dir, old), s"compact: could not stage $dir")
        require(fs.rename(tmp, dir), s"compact: could not promote $tmp")
        fs.delete(old, true)
        compacted += 1
      }
    }
    compacted
  }

  /** Write a small unbucketed managed table (index metadata and the
    * like), with the same drop-stale-incarnation hygiene as
    * `writeBucketed`.
    */
  def writeTable(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(table)
  }

  /** Hive-style partitioned write — the 100 TB layout tool for
    * partition PRUNING: a reader filtering on `partitionCols` lists
    * and reads only the matching directories (the scan shows
    * `PartitionFilters`, and non-matching files are never opened).
    * Choose low-cardinality columns (day, source, split); combine
    * with `writeBucketed` inside partitions when co-located joins are
    * also needed.
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: String*): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
