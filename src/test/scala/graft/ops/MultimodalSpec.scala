package graft.ops

import graft.SparkSpec
import graft.ops.Multimodal._

class MultimodalSpec extends SparkSpec {

  private def media(rows: MediaRow*) = {
    import spark.implicits._
    spark.createDataset(rows)
  }

  private def row(id: Long, kind: String, bytes: Array[Byte],
                  w: Int = 640, h: Int = 480, frames: Int = 10) =
    MediaRow(id, kind, bytes, MediaMeta(w, h, 3, 44100, frames, 1000L))

  test("extractFeatures: deterministic, batched, one row per input") {
    val ds = media(
      row(1L, "image", Array[Byte](1, 2, 3)),
      row(2L, "image", Array[Byte](1, 2, 3)),
      row(3L, "audio", Array[Byte](9, 9, 9, 9)))
    val out = extractFeatures(ds).collect().sortBy(_.media_id)
    assert(out.length == 3)
    // same bytes => same pseudo-features (stub codec is deterministic)
    assert(out(0).features.toSeq == out(1).features.toSeq)
    assert(out(0).content_hash == out(1).content_hash)
    assert(out(0).n_bytes == 3 && out(2).n_bytes == 4)
    assert(out(0).features.length == 8)
  }

  test("sampleFrames: every stride-th frame of videos only") {
    val ds = media(
      row(1L, "video", Array[Byte](5, 5), frames = 10),
      row(2L, "image", Array[Byte](5, 5), frames = 10))
    val out = sampleFrames(ds, stride = 3).collect()
    assert(out.map(_.media_id).toSet == Set(1L))
    assert(out.map(_.frame_idx).sorted.toSeq == Seq(0, 3, 6, 9))
    // per-frame hashes differ (frame index folded into the stub decode)
    assert(out.map(_.frame_hash).distinct.length == 4)
  }

  test("planResize: preserves aspect ratio, never upscales") {
    import spark.implicits._
    val df = media(row(1L, "image", Array[Byte](0), w = 4000, h = 2000),
      row(2L, "image", Array[Byte](0), w = 100, h = 50)).toDF()
    val out = planResize(df, maxSide = 1000).collect()
      .map(r => (r.getLong(0), (r.getInt(3), r.getInt(4)))).toMap
    assert(out(1L) == ((1000, 500)))
    assert(out(2L) == ((100, 50))) // already small: untouched
  }
}
