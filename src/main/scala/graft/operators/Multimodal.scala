package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract / resize run batch-wise over partitions.
  *
  * The actual codec calls are STUBBED with a deterministic fake (this
  * container ships no image/audio libraries); everything Spark-side —
  * schema, encoders, per-partition batching, partition sizing — is real
  * and tested. Swapping [[DecodeStub.decode]] for a JNI/ImageIO call is
  * the only change needed for real payloads.
  *
  * Scale notes: decode is the canonical CPU-heavy narrow transform. It
  * runs as `mapPartitions` (one iterator pass, no shuffle); upstream,
  * callers should `repartition` so one partition ≈ one task ≈ a few
  * hundred MB of payload — set via `spark.sql.files.maxPartitionBytes`
  * when reading real blob parquet.
  */
object Multimodal {

  /** Typed media metadata carried next to the binary payload. */
  final case class MediaMeta(
      width: Long, height: Long, channels: Long, nBytes: Long, format: String)

  final case class MediaRow(id: Long, content: Array[Byte])
  final case class DecodedRow(id: Long, width: Long, height: Long,
      channels: Long, nBytes: Long, format: String)

  /** Deterministic fake decode: "parses" dimensions from payload length.
    * Stands in for an image decoder; pure function of the bytes. */
  object DecodeStub {
    def decode(content: Array[Byte]): MediaMeta = {
      val n = content.length.toLong
      MediaMeta(
        width = n % 640L,
        height = (n * 7L) % 480L,
        channels = 3L,
        nBytes = n,
        format = if (n % 2L == 0L) "png" else "jpeg")
    }

    /** Fake resize: new meta, payload untouched (a real impl would
      * re-encode). */
    def resize(meta: MediaMeta, w: Long, h: Long): MediaMeta =
      meta.copy(width = w, height = h)

    /** Fake frame sampling for video payloads: frame offsets every
      * `stride` bytes — deterministic stand-in for keyframe extraction. */
    def sampleFrames(content: Array[Byte], stride: Int): Seq[Long] =
      content.indices.by(math.max(1, stride)).map(_.toLong)
  }

  /** Decode a (id, content: binary) frame into typed metadata, batch-wise
    * per partition. Input columns: `idCol` (long), `binCol` (binary). */
  def decodeImages(df: DataFrame, idCol: String, binCol: String): Dataset[DecodedRow] = {
    val ds = df.select(col(idCol).cast("long").as("id"), col(binCol).as("content"))
      .as(Encoders.product[MediaRow])
    ds.mapPartitions { it =>
      it.map { r =>
        val m = DecodeStub.decode(r.content)
        DecodedRow(r.id, m.width, m.height, m.channels, m.nBytes, m.format)
      }
    }(Encoders.product[DecodedRow])
  }

  /** Frame-sample a video-ish binary column: one output row per sampled
    * frame offset. */
  def sampleFrameOffsets(df: DataFrame, idCol: String, binCol: String,
      stride: Int): DataFrame = {
    val ds = df.select(col(idCol).cast("long").as("id"), col(binCol).as("content"))
      .as(Encoders.product[MediaRow])
    ds.flatMap { r =>
      DecodeStub.sampleFrames(r.content, stride).map(off => (r.id, off))
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .toDF("id", "frame_offset")
  }
}
