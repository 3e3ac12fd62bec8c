package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r13 sink-partition compaction: batchId-keyed foreachBatch sinks
  * accumulate a directory per micro-batch with a file per writing
  * task; compaction must drop the file count to one per directory,
  * shuffle-free, with replayed reads byte-identical (same rows, same
  * partition column), and survive its own crash points (the
  * `_`-prefixed temp dirs are invisible to readers).
  */
class SinkCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def dataFiles(dir: java.nio.file.Path): Seq[java.io.File] =
    dir.toFile.listFiles().toSeq
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))

  private def writeSink(root: java.nio.file.Path, batches: Int,
                        filesPer: Int): Unit =
    (0 until batches).foreach { b =>
      (0 until 20).map(i => (b * 100L + i, s"doc $b-$i"))
        .toDF("doc_id", "text")
        .repartition(filesPer)
        .write.mode("overwrite")
        .parquet(BatchProcessors.batchDir(root, b.toLong))
    }

  test("compaction drops file count to 1 per batch dir; replayed reads row-identical") {
    val out = java.nio.file.Files.createTempDirectory("graft-compact")
    writeSink(out, batches = 4, filesPer = 3)
    def rows() = spark.read.parquet(out.toString)
      .select("batch_id", "doc_id", "text")
      .collect().map(_.toString).sorted.toSeq
    val before = rows()
    val perDirBefore = (0 until 4).map(b =>
      dataFiles(out.resolve(s"batch_id=$b")).size)
    assert(perDirBefore.forall(_ == 3), s"fixture: $perDirBefore")

    val n = BatchProcessors.compactSink(spark, out)
    assert(n == 4, s"all four dirs compacted, got $n")
    (0 until 4).foreach { b =>
      val files = dataFiles(out.resolve(s"batch_id=$b"))
      assert(files.size == 1, s"batch $b still has ${files.size} files")
    }
    assert(rows() == before, "replayed read must be row-identical")
    // idempotent: nothing left to compact
    assert(BatchProcessors.compactSink(spark, out) == 0)
  }

  test("a crash-leftover temp dir is invisible to readers and cleaned by the next pass") {
    val out = java.nio.file.Files.createTempDirectory("graft-compact2")
    writeSink(out, batches = 2, filesPer = 2)
    val before = spark.read.parquet(out.toString)
      .collect().map(_.toString).sorted.toSeq
    // simulate a crash: a half-written temp dir next to the real ones
    // (no '=' in its name — see compactPartitionedDir)
    Seq((999L, "junk")).toDF("doc_id", "text")
      .write.parquet(s"$out/_compact_batch_id.0")
    assert(spark.read.parquet(out.toString)
      .collect().map(_.toString).sorted.toSeq == before,
      "underscore-prefixed dirs must be invisible to the partitioned read")
    val n = BatchProcessors.compactSink(spark, out)
    assert(n == 2)
    assert(spark.read.parquet(out.toString)
      .collect().map(_.toString).sorted.toSeq == before)
  }

  test("the compaction plan is shuffle-free (coalesce, no exchange)") {
    val out = java.nio.file.Files.createTempDirectory("graft-compact3")
    writeSink(out, batches = 1, filesPer = 3)
    val plan = spark.read.parquet(s"$out/batch_id=0").coalesce(1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"per-directory compaction must not shuffle:\n$plan")
  }
}
