package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Multimodal.asMediaTable(
    graft.Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text")

  test("media table schema and metadata") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("byte_len").dataType.typeName == "long")
    val r = media.orderBy("media_id").head()
    assert(r.getAs[Long]("byte_len") > 0)
    assert(Seq("image", "audio", "video", "unknown").contains(r.getAs[String]("media_type")))
    // metadata-only query must not deserialize payloads to answer
    assert(media.filter($"byte_len" > 100).count() > 0)
  }

  test("stubbed batch decode is deterministic and schema-correct") {
    import Multimodal._
    val ds = media.limit(20).as[MediaRow]
    val out1 = decodeImagesStub(ds, batchSize = 7).collect().sortBy(_.media_id)
    val out2 = decodeImagesStub(ds, batchSize = 3).collect().sortBy(_.media_id)
    assert(out1.length == 20)
    // batch size must not change results (pure per-item contract)
    assert(out1.map(d => (d.media_id, d.width, d.height, d.features.toSeq)).toSeq ==
           out2.map(d => (d.media_id, d.width, d.height, d.features.toSeq)).toSeq)
    out1.foreach { d =>
      assert(d.width >= 16 && d.height >= 16 && d.n_channels == 3)
      assert(d.features.length == 8)
      assert(d.features.forall(f => f >= 0f && f <= 1f))
    }
  }

  test("resize preserves aspect contract") {
    import Multimodal._
    val ds = media.limit(10).as[MediaRow]
    val resized = resizeStub(decodeImagesStub(ds), maxSide = 32).collect()
    resized.foreach { d => assert(math.max(d.width, d.height) <= 32) }
  }

  test("frame sampling emits strided frames") {
    import Multimodal._
    val ds = media.limit(5).as[MediaRow]
    val frames = sampleFramesStub(ds, stride = 4)
    val grouped = frames.groupBy("media_id").agg(count(lit(1)).as("n"),
      max("frame_no").as("mx")).collect()
    assert(grouped.length == 5)
    grouped.foreach { r => assert(r.getAs[Long]("n") > 0) }
    val one = frames.filter($"media_id" === grouped.head.getLong(0))
      .orderBy("frame_no").select("frame_no").collect().map(_.getInt(0))
    assert(one.zip(one.tail).forall { case (a, b) => b - a == 4 })
  }
}
