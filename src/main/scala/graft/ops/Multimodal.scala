package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines.
  *
  * Data model: media travels as an opaque `binary` payload column plus
  * a typed metadata struct (`media_type`, `byte_len`, decode hints).
  * The payload is NEVER interpreted by Catalyst — filters and joins
  * run on the metadata columns, so the scan can prune/push down
  * without touching bytes, and only the final decode stage reads them.
  *
  * Scale design: decode runs per-partition over batches (see
  * `decodeImagesStub`) so a real codec (JNI / Arrow-batched) amortizes
  * per-call overhead; partition sizing is controlled upstream by
  * `spark.sql.files.maxPartitionBytes`. The decode itself is STUBBED
  * here — the container ships no image/audio codecs — with a
  * deterministic fake that preserves the exact Spark-side contract
  * (schema, batching, null behavior) a real decoder would have.
  */
object Multimodal {

  /** Media row with typed metadata, as a real media lake would store it. */
  case class MediaRow(
      media_id: Long,
      media_type: String,   // "image" | "audio" | "video" | "unknown"
      byte_len: Long,
      payload: Array[Byte])

  /** Decoded-image feature row produced by the (stubbed) decoder. */
  case class DecodedImage(
      media_id: Long,
      width: Int,
      height: Int,
      n_channels: Int,
      features: Array[Float])

  /** Wrap any table into the media schema, treating a string column as
    * the opaque payload (the synthetic corpus has no true binaries;
    * the plumbing — binary type, metadata struct, batching — is real).
    * Media type is sniffed from leading "magic bytes" the way a real
    * pipeline sniffs JPEG/PNG/RIFF headers.
    */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val payload = col(payloadCol).cast("binary")
    df.select(
      col(idCol).cast("long").as("media_id"),
      when(substring(payload, 1, 1) === lit("a".getBytes), "audio")
        .when(substring(payload, 1, 1) === lit("v".getBytes), "video")
        .when(length(payload) > 0, "image")
        .otherwise("unknown").as("media_type"),
      octet_length(payload).cast("long").as("byte_len"),
      payload.as("payload"))
  }

  /** STUB image decode (no codecs in this container): deterministically
    * derives dimensions and a small feature vector from the payload
    * bytes. Runs via `mapPartitions` in fixed-size batches — the exact
    * shape a real vectorized decoder (e.g. Arrow-fed JNI) needs, so
    * swapping the fake `decodeBatch` body for a real codec changes
    * nothing else.
    */
  def decodeImagesStub(
      media: Dataset[MediaRow],
      batchSize: Int = 64,
      featureDim: Int = 8): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // real impl: hand `batch` to the codec as one call — STUB below
        batch.iterator.map { m =>
          val h = m.payload.foldLeft(1469598103934665603L)((a, b) => (a ^ b) * 1099511628211L)
          val w = 16 + math.floorMod(h, 16).toInt * 16
          val ht = 16 + math.floorMod(h >> 8, 16).toInt * 16
          val feats = Array.tabulate(featureDim) { i =>
            math.floorMod(h >> (i * 4), 1024).toFloat / 1024f
          }
          DecodedImage(m.media_id, w, ht, 3, feats)
        }
      }
    }
  }

  /** STUB resize: deterministic projection of the feature contract —
    * same signature a real resampler would have.
    */
  def resizeStub(decoded: Dataset[DecodedImage], maxSide: Int): Dataset[DecodedImage] = {
    import decoded.sparkSession.implicits._
    decoded.map { d =>
      val scale = math.min(1.0, maxSide.toDouble / math.max(d.width, d.height))
      d.copy(width = math.max(1, (d.width * scale).toInt),
             height = math.max(1, (d.height * scale).toInt))
    }
  }

  /** STUB frame sampling for video payloads: emits every `stride`-th
    * synthetic frame id, preserving the (media_id, frame_no) shape of a
    * real frame sampler.
    */
  def sampleFramesStub(media: Dataset[MediaRow], stride: Int): DataFrame = {
    val nFrames = (col("byte_len") / 16 + 1).cast("int")
    media.toDF().select(col("media_id"), explode(
      sequence(lit(0), nFrames - 1, lit(stride))).as("frame_no"))
  }
}
