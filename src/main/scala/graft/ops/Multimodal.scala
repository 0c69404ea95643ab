package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (driver mandate: image/audio/video as opaque
  * binary columns with typed metadata; decode/feature-extract/resize/
  * frame-sample as batched partition-level transforms).
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * container): [[StubCodec]] derives deterministic pseudo-features from the
  * bytes. Everything around it — schema, batching, partition-level
  * execution, explode of sampled frames — is real Spark plumbing, tested in
  * MultimodalSpec. Swapping in a real decoder touches only StubCodec.
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

  /** The stub decode layer — deterministic fake in place of a real codec. */
  object StubCodec {
    /** Stand-in for image/audio decode + feature extraction: a real
      * implementation would decode `bytes` and run a feature model; the
      * stub derives an 8-dim deterministic pseudo-embedding from a rolling
      * hash of the payload so tests are stable.
      */
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
    * per partition, rows streamed through it.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (once per task, not per row)
      rows.map { r =>
        MediaFeatures(r.media_id, r.kind, r.content.length.toLong,
          StubCodec.frameHash(r.content, 0),
          StubCodec.decodeFeatures(r.content))
      }
    }
  }

  /** Frame sampling: every `stride`-th frame of each video, exploded to one
    * row per sampled frame — the shape a caption/filter model consumes.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      (0 until r.meta.n_frames by stride).map(i =>
        FrameRow(r.media_id, i, StubCodec.frameHash(r.content, i)))
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
