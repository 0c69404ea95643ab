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

  test("PpmCodec: byte-exact decode of a hand-built P6 image, comments and all") {
    // 2x1 image, red then blue, maxval 255, with a header comment — built
    // by hand so the decoder is pinned to the public netpbm byte layout,
    // not to our own encoder
    val px = Array[Byte](255.toByte, 0, 0, 0, 0, 255.toByte)
    val raw = ("P6\n# a comment\n2 1\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)) ++ px
    val img = PpmCodec.decode(raw).get
    assert(img.width == 2 && img.height == 1 && img.maxVal == 255)
    assert(img.pixels.toSeq == px.toSeq)
    val (mr, mg, mb) = PpmCodec.channelMeans(img)
    assert(mr == 127.5 && mg == 0.0 && mb == 127.5)
  }

  test("PpmCodec: encode/decode round-trips; garbage and truncation decode to None") {
    val px = Array.tabulate(8 * 8 * 3)(i => (i % 251).toByte)
    val enc = PpmCodec.encode(8, 8, px)
    val dec = PpmCodec.decode(enc).get
    assert(dec.width == 8 && dec.height == 8 && dec.pixels.toSeq == px.toSeq)
    assert(PpmCodec.decode("not an image".getBytes).isEmpty)
    assert(PpmCodec.decode(enc.dropRight(1)).isEmpty, "truncated pixel data must not decode")
    assert(PpmCodec.decode(Array[Byte]('P', '6')).isEmpty)
    assert(PpmCodec.decode(null).isEmpty)
  }

  test("extractFeatures: PPM images get REAL decoded features; others fall back to byte stats") {
    val px = Array.tabulate(4 * 2 * 3)(i => (10 * i).toByte)
    val ds = media(
      row(1L, "image", PpmCodec.encode(4, 2, px), w = 4, h = 2),
      row(2L, "audio", Array[Byte](9, 9, 9, 9)))
    val out = extractFeatures(ds).collect().sortBy(_.media_id)
    val imgFeats = out(0).features
    assert(imgFeats.length == 6)
    assert(imgFeats(0) == 4.0f && imgFeats(1) == 2.0f && imgFeats(5) == 255.0f)
    val img = PpmCodec.decode(PpmCodec.encode(4, 2, px)).get
    val (mr, mg, mb) = PpmCodec.channelMeans(img)
    assert(imgFeats(2) == mr.toFloat && imgFeats(3) == mg.toFloat && imgFeats(4) == mb.toFloat)
    assert(out(1).features.length == 8) // byte-stat fallback shape
  }

  test("decodeImages: drops undecodable rows, means match a driver-side recompute") {
    val pxA = Array.tabulate(8 * 8 * 3)(i => ((i * 7) % 256).toByte)
    val ds = media(
      row(1L, "image", PpmCodec.encode(8, 8, pxA), w = 8, h = 8),
      row(2L, "image", Array[Byte](1, 2, 3))) // not a PPM: dropped
    val out = decodeImages(ds).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    val r = out.head
    def mean(off: Int) = (off until pxA.length by 3).map(pxA(_) & 0xFF).sum / 64.0
    assert(r.getLong(1) == 8 && r.getLong(2) == 8)
    assert(r.getDouble(3) == mean(0) && r.getDouble(4) == mean(1) && r.getDouble(5) == mean(2))
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
