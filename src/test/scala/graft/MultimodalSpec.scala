package graft

import graft.llm.MultimodalOps
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = MultimodalOps.asMedia(
    Seq((1L, "hello world"), (2L, "x")).toDF("doc_id", "text"), "text", "doc_id")

  test("media columns are opaque binary + typed metadata") {
    val m = media
    assert(m.schema("media").dataType.typeName == "binary")
    val meta = MultimodalOps.decodeImageMeta(m)
    val r = meta.filter($"media_id" === 1L).head()
    assert(r.getAs[Int]("n_bytes") == 11)
    assert(r.getAs[Int]("width") == 16 + 11 % 240)
    assert(r.getAs[Int]("channels") == 3)
  }

  test("frame sampling explodes 1->N with ordered frame indexes") {
    val frames = MultimodalOps.sampleFrames(media, n = 4)
    assert(frames.count() == 8)
    val idx = frames.filter($"media_id" === 1L).select("frame_idx")
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(idx == Seq(0, 1, 2, 3))
    assert(frames.schema("frame").dataType.typeName == "binary")
  }

  test("decodeImageMeta parses real PNG IHDR and JPEG SOF headers") {
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    // minimal-but-real PNG: signature + IHDR(640x480, bit depth 8, RGBA)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes("US-ASCII") ++
      be32(640) ++ be32(480) ++ Array[Byte](8, 6, 0, 0, 0) ++ be32(0)
    // minimal-but-real JPEG: SOI, APP0 (16 bytes), DQT-ish skip segment,
    // then SOF0 with 480x640 x 3 components
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte) ++
      Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(16) ++
        new Array[Byte](14) ++
      Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(17) ++
        Array[Byte](8) ++ be16(480) ++ be16(640) ++ Array[Byte](3) ++
        new Array[Byte](9)
    // progressive JPEG variant: SOF2 instead of SOF0
    val jpegP = jpeg.clone(); jpegP(21) = 0xc2.toByte
    // GIF89a logical screen descriptor: 320x200 little-endian
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](0x40, 0x01, 0xc8.toByte, 0x00) ++ new Array[Byte](4)
    val df = spark.createDataFrame(Seq(
      (1L, png), (2L, jpeg), (3L, jpegP), (5L, gif),
      (4L, "not an image".getBytes("UTF-8"))))
      .toDF("media_id", "media")
    val out = MultimodalOps.decodeImageMeta(df).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(2), r.getInt(3), r.getInt(4), r.getString(5)))).toMap
    assert(out(1L) == ((640, 480, 4, "png")))
    assert(out(2L) == ((640, 480, 3, "jpeg")))
    assert(out(3L) == ((640, 480, 3, "jpeg-progressive")))
    assert(out(5L) == ((320, 200, 3, "gif")))
    assert(out(4L)._4 == "stub") // non-image bytes keep the stub fallback
  }

  test("feature extraction emits fixed-dim float vectors") {
    val f = MultimodalOps.extractFeatures(media)
    val v = f.head().getSeq[Float](1)
    assert(v.length == 16)
    assert(MultimodalOps.extractFeatures(media).head().getSeq[Float](1) == v) // deterministic
  }
}
