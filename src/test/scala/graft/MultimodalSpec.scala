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

  test("feature extraction emits fixed-dim float vectors") {
    val f = MultimodalOps.extractFeatures(media)
    val v = f.head().getSeq[Float](1)
    assert(v.length == 16)
    assert(MultimodalOps.extractFeatures(media).head().getSeq[Float](1) == v) // deterministic
  }
}
