package graft.operators

import org.apache.spark.sql.Dataset

/** Multimodal-column plumbing for GENUINELY CODEC-REQUIRING work:
  * image/audio/video payloads ride as opaque `binary` columns with typed
  * metadata, and feature extraction runs as partition-batched iteration
  * over a typed Dataset — the JVM analog of the Arrow/`mapInPandas` path
  * a Python pipeline would use.
  *
  * This is the SECOND of two decode tiers. Structural header metadata
  * (width/height/bit-depth of BMP and PNG payloads, channels/sample-rate
  * /bits of WAV) needs no codec and is parsed natively by the codegen'd
  * Catalyst expressions in [[graft.functions.MediaHeader HeaderField]]
  * (q177/q181/q185) — that is the first-class path and never leaves
  * whole-stage codegen. ONLY the
  * pixel/sample-level work that requires an actual codec lands here, and
  * since no media codecs exist in this environment, `decodeStub` derives
  * deterministic fake dimensions/frame counts from the payload's md5.
  * Everything around it — schema, encoders, iterator-to-iterator
  * partition processing, downstream relational ops — is the real
  * production shape: swap `decodeStub` for a JNI/FFmpeg/ImageIO call and
  * nothing else changes.
  *
  * Scale notes (100 TB): `mapPartitions` is iterator→iterator, so a
  * partition's blobs stream through without materializing; binary
  * payloads stay columnar in parquet scan + shuffle; features are small
  * fixed-width rows, so the expensive bytes are dropped as early as the
  * projection allows. Frame expansion (one row per sampled frame) is a
  * bounded explode downstream of extraction.
  */
object Multimodal {

  /** One media object: id + mime + raw payload bytes. */
  final case class MediaRecord(media_id: Long, mime: String,
      bytes: Array[Byte])

  /** Extracted features (fixed-width; payload dropped). */
  final case class MediaFeatures(media_id: Long, mime: String,
      n_bytes: Long, checksum: Long, width: Int, height: Int, n_frames: Int)

  /** STUB decoder — deterministic fake in place of a real codec.
    * checksum = first 15 md5 hex digits as a 60-bit int (the same value
    * SQL computes as `CAST('0x'||substring(md5(payload),1,15) AS BIGINT)`,
    * which is what makes the whole pipeline oracle-checkable). */
  def decodeStub(bytes: Array[Byte]): (Long, Int, Int, Int) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
    val h60 = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    (h60,
      64 + (h60 % 193).toInt,
      64 + ((h60 / 193) % 193).toInt,
      1 + (h60 % 7).toInt)
  }

  /** Partition-batched feature extraction (iterator→iterator). */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (h60, w, h, frames) = decodeStub(m.bytes)
        MediaFeatures(m.media_id, m.mime, m.bytes.length.toLong, h60,
          w, h, frames)
      }
    }
  }
}
