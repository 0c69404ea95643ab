package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (driver mandate: image/audio/video as opaque
  * binary columns with typed metadata; decode/feature-extract/resize/
  * frame-sample as batched partition-level transforms).
  *
  * The IMAGE path is a real codec: [[PpmCodec]] parses the binary PPM (P6)
  * format — a public, dependency-free format (netpbm) — and extracts
  * per-channel statistics from the actual pixel bytes, so the image-feature
  * query carries a full value oracle. Audio/video decoding has no
  * in-container codec, so those kinds fall back to the honest byte-level
  * stand-in [[ByteStatCodec]]; swapping in a real decoder touches only that
  * object.
  *
  * Scale notes: decode runs inside `mapPartitions` so per-partition codec
  * state (a decoder instance) is initialized once per task, not per row —
  * the Scala analog of a Pandas-UDF batch loop. Binary payloads never
  * shuffle: decode happens before any wide transform and emits only
  * features/metadata.
  */
object Multimodal {

  /** Typed metadata carried next to every opaque binary payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("content", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_channels", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("duration_ms", LongType))))))

  final case class MediaMeta(width: Int, height: Int, n_channels: Int,
                             sample_rate: Int, n_frames: Int, duration_ms: Long)
  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                                 content_hash: Long, features: Array[Float])
  final case class FrameRow(media_id: Long, frame_idx: Int, frame_hash: Long)

  /** Real decoder for the binary PPM (P6) image format — public netpbm
    * spec, zero dependencies: header `P6 <w> <h> <maxval>` (whitespace
    * separated, '#'-comments allowed) followed by one whitespace byte and
    * w·h raw RGB byte triplets (maxval ≤ 255). Tested byte-exact in
    * MultimodalSpec; feeds the oracle-backed `q_media_features`.
    */
  object PpmCodec {
    final case class Image(width: Int, height: Int, maxVal: Int, pixels: Array[Byte])

    def encode(width: Int, height: Int, pixels: Array[Byte], maxVal: Int = 255): Array[Byte] = {
      require(pixels.length == width * height * 3,
        s"need ${width * height * 3} RGB bytes, got ${pixels.length}")
      require(maxVal > 0 && maxVal <= 255, "1-byte samples only")
      val header = s"P6\n$width $height\n$maxVal\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val out = new Array[Byte](header.length + pixels.length)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(pixels, 0, out, header.length, pixels.length)
      out
    }

    /** None for anything that is not a complete single-byte-sample P6
      * payload — callers treat that as "not an image I can decode", never
      * as an error.
      */
    def decode(bytes: Array[Byte]): Option[Image] = {
      if (bytes == null || bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
      var i = 2
      def skipWs(): Unit = {
        var more = true
        while (more && i < bytes.length) {
          val c = bytes(i)
          if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
          else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') i += 1
          else more = false
        }
      }
      def int(): Int = {
        var v = 0
        var any = false
        while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9' && v < (1 << 24)) {
          v = v * 10 + (bytes(i) - '0'); i += 1; any = true
        }
        if (any) v else -1
      }
      skipWs(); val w = int()
      skipWs(); val h = int()
      skipWs(); val mx = int()
      if (w <= 0 || h <= 0 || mx <= 0 || mx > 255) return None
      i += 1 // exactly one whitespace byte separates maxval from pixel data
      val need = w.toLong * h * 3
      if (need > Int.MaxValue || bytes.length - i < need) return None
      Some(Image(w, h, mx, java.util.Arrays.copyOfRange(bytes, i, i + need.toInt)))
    }

    /** Per-channel pixel means: exact integer sums, ONE double division —
      * the arithmetic the SQL oracle mirrors (sum of bytes / pixel count).
      */
    def channelMeans(img: Image): (Double, Double, Double) = {
      var r = 0L; var g = 0L; var b = 0L
      var i = 0
      while (i < img.pixels.length) {
        r += img.pixels(i) & 0xFF
        g += img.pixels(i + 1) & 0xFF
        b += img.pixels(i + 2) & 0xFF
        i += 3
      }
      val n = (img.width * img.height).toDouble
      (r / n, g / n, b / n)
    }
  }

  /** Byte-level stand-in for the kinds with no in-container codec (audio,
    * video): deterministic pseudo-features from a rolling hash of the
    * payload. Honest placeholder — swapping in a real decoder touches only
    * this object; the batching/schema plumbing around it is shared with the
    * real PPM path.
    */
  object ByteStatCodec {
    /** 8-dim deterministic pseudo-embedding from a rolling hash. */
    def decodeFeatures(bytes: Array[Byte], dim: Int = 8): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) {
        h = 31 * h + bytes(i)
        out(i % dim) += (h % 1000L) / 1000.0f
        i += 1
      }
      out
    }

    /** Stand-in for video frame decode: returns a per-frame hash for the
      * sampled frame indices (a real codec would return pixel buffers).
      */
    def frameHash(bytes: Array[Byte], frameIdx: Int): Long = {
      var h = 1125899906842597L ^ frameIdx.toLong
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      h
    }
  }

  /** Batched decode/feature-extract over binary payloads: one codec "init"
    * per partition, rows streamed through it. Images that parse as PPM get
    * REAL decoded features [width, height, meanR, meanG, meanB, maxval];
    * everything else falls back to the byte-stat placeholder.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (once per task, not per row)
      rows.map { r =>
        val feats = (if (r.kind == "image") PpmCodec.decode(r.content) else None) match {
          case Some(img) =>
            val (mr, mg, mb) = PpmCodec.channelMeans(img)
            Array(img.width.toFloat, img.height.toFloat,
              mr.toFloat, mg.toFloat, mb.toFloat, img.maxVal.toFloat)
          case None => ByteStatCodec.decodeFeatures(r.content)
        }
        MediaFeatures(r.media_id, r.kind, r.content.length.toLong,
          ByteStatCodec.frameHash(r.content, 0), feats)
      }
    }
  }

  final case class ImageStats(media_id: Long, width: Long, height: Long,
                              mean_r: Double, mean_g: Double, mean_b: Double)

  /** Decode-and-summarize for image payloads: parse each binary PPM and
    * emit per-channel pixel means (exact integer sums, one double
    * division — raw, unrounded; callers round for presentation). Rows that
    * do not parse as P6 are dropped (flatMap), mirroring a pipeline's
    * decode-or-discard step. This is the oracle-backed surface: the means
    * are a pure function of known payload bytes.
    */
  def decodeImages(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        PpmCodec.decode(r.content).map { img =>
          val (mr, mg, mb) = PpmCodec.channelMeans(img)
          ImageStats(r.media_id, img.width.toLong, img.height.toLong, mr, mg, mb)
        }
      }
    }.toDF()
  }

  /** Frame sampling: every `stride`-th frame of each video, exploded to one
    * row per sampled frame — the shape a caption/filter model consumes.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      (0 until r.meta.n_frames by stride).map(i =>
        FrameRow(r.media_id, i, ByteStatCodec.frameHash(r.content, i)))
    }
  }

  /** "Resize" metadata transform (pure column math — no decode needed):
    * target dimensions preserving aspect ratio, as a pipeline would compute
    * before batching the actual resize into the codec step.
    */
  def planResize(media: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(
      lit(maxSide) / col("meta.width").cast("double"),
      lit(maxSide) / col("meta.height").cast("double"), lit(1.0))
    media.select(col("media_id"),
      col("meta.width").as("width"), col("meta.height").as("height"),
      ceil(col("meta.width") * scale).cast("int").as("target_width"),
      ceil(col("meta.height") * scale).cast("int").as("target_height"))
  }

  /** Oracle-checkable byte-level pipeline over a string column treated as an
    * opaque payload: byte length + md5 digest (what a real pipeline logs per
    * blob for integrity). Exercises the binary path end-to-end against the
    * DuckDB oracle.
    */
  def payloadDigest(documents: DataFrame): DataFrame =
    documents.select(
        col("doc_id"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        md5(col("text").cast("binary")).as("digest"))
      .orderBy("doc_id")
}
