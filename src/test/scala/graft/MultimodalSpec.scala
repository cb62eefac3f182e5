package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("decode stub derives deterministic metadata from payload bytes") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "image", Array.fill[Byte](100)(7)),
      Multimodal.MediaRow(2L, "video", Array.fill[Byte](130)(1))
    ).toDS()
    val out = Multimodal.decode(media).collect().sortBy(_.id)
    assert(out(0) == Multimodal.MediaMeta(1L, "image", 100L, 16 + 100 % 64, 16 + (100 / 64) % 64, 1L))
    assert(out(1) == Multimodal.MediaMeta(2L, "video", 130L, 16 + 130 % 64, 16 + (130 / 64) % 64, 1 + 130 % 7))
  }

  test("sampleFrames strides over video frames only") {
    import spark.implicits._
    val meta = Seq(
      Multimodal.MediaMeta(1L, "video", 10L, 20L, 20L, 5L),
      Multimodal.MediaMeta(2L, "image", 10L, 20L, 20L, 1L)
    ).toDS()
    val out = Multimodal.sampleFrames(meta, stride = 2).collect()
    assert(out.length == 1)
    assert(out(0).getSeq[Long](2) == Seq(0L, 2L, 4L))
  }

  test("fromText builds binary payloads with UTF-8 byte length") {
    import spark.implicits._
    val df = Seq((1L, "abc"), (2L, "中")).toDF("id", "t")
    val media = Multimodal.fromText(df, "id", "t", "audio").collect().sortBy(_.id)
    assert(media(0).bytes.length == 3)
    assert(media(1).bytes.length == 3) // 中 is 3 UTF-8 bytes
    assert(media.forall(_.kind == "audio"))
  }
}
