package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Multimodal column handling: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed in partition-sized batches.
  *
  * The Spark-side plumbing is real (schema, partitioning, batch shape,
  * typed Encoders); the media DECODE step is a clearly-marked
  * deterministic STUB — the container has no image/audio codecs, and at
  * production scale the stub body is the only thing to swap for a real
  * decoder (the `mapPartitions` batch shape is exactly where a JNI/
  * native decoder or an Arrow-batched Python worker plugs in).
  */
object Multimodal {

  /** Typed record for decoded-media features. */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, feature: Array[Float])

  /** STUB decode: deterministic pseudo-features derived from the
    * payload bytes. Replace the body with a real codec (e.g. JNI
    * libjpeg / ffmpeg frame sampler); signature and batch shape stay. */
  def stubDecode(id: Long, kind: String, payload: Array[Byte]): MediaFeatures = {
    var h = 0L
    var i = 0
    while (i < payload.length) { h = h * 31 + (payload(i) & 0xFF); i += 1 }
    val w = 16 + (Hashing.splitmix64(h) & 0x3F).toInt      // fake 16..79 px
    val ht = 16 + (Hashing.splitmix64(h + 1) & 0x3F).toInt
    val feat = Array.tabulate(8)(j =>
      (Hashing.splitmix64(h + 2 + j).toDouble / Long.MaxValue).toFloat)
    MediaFeatures(id, kind, payload.length, w, ht, feat)
  }

  /** Feature extraction over a media frame: one decoder instance per
    * partition, rows streamed through it (the batch shape a real
    * decoder needs — no per-row setup, no driver collect). Input needs
    * columns (media_id long, kind string, payload binary). */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder setup would go here (STUB: none needed)
        rows.map { case (id, kind, payload) => stubDecode(id, kind, payload) }
      }
  }

  /** STUB resize: deterministic downsample of the payload bytes to a
    * `target × target` grid (stride sampling). A real implementation
    * swaps the body for a codec + interpolation kernel; the signature
    * (bytes → bytes + new dims) and the per-partition batch shape are
    * what the pipeline depends on. */
  def stubResize(payload: Array[Byte], target: Int): Array[Byte] = {
    val n = target * target
    if (payload.isEmpty) new Array[Byte](n)
    else Array.tabulate(n)(i => payload((i.toLong * payload.length / n).toInt))
  }

  /** STUB frame sampling: split the payload into `frames` equal spans
    * ("frames") and keep every `stride`-th one — the video path's
    * batch shape (one row in, few rows out via flatMap). */
  def stubFrameSample(payload: Array[Byte], frames: Int, stride: Int)
      : Seq[(Int, Array[Byte])] = {
    if (payload.isEmpty || frames <= 0) Nil
    else {
      val span = math.max(1, payload.length / frames)
      (0 until frames by stride).map { f =>
        val start = f * span
        f -> payload.slice(start, math.min(start + span, payload.length))
      }
    }
  }

  final case class Frame(media_id: Long, frame_no: Int, frame_bytes: Array[Byte])

  /** Frame extraction over a media frame table: flatMap through the
    * stub sampler, preserving distributed batch shape. */
  def sampleFrames(media: DataFrame, frames: Int = 8, stride: Int = 2)
      : Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        stubFrameSample(payload, frames, stride).map { case (f, b) =>
          Frame(id, f, b)
        }
      }
  }

  /** Metadata pass over binary payloads — pure native expressions
    * (no decode): byte size, content hash, magic-byte sniffing. */
  def describePayloads(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      length(col("payload")).as("n_bytes"),
      xxhash64(col("payload")).as("content_hash"),
      substring(col("payload"), 1, 4).cast("string").as("magic"))
}
