package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import java.security.MessageDigest

/** Multimodal (image/audio/video) column handling.
  *
  * The pattern: media travels as an opaque `binary` payload column plus
  * a typed metadata struct; decode / feature-extraction runs as typed
  * `mapPartitions` over the payload bytes — per-partition, streaming,
  * no driver involvement, the exact shape a real decoder (JNI to
  * libjpeg/ffmpeg) would plug into.
  *
  * STUB NOTE: this container has no image/audio codecs, so
  * [[decodeFeatures]] computes a deterministic fake "decode" (payload
  * length, md5-derived checksum, head-bytes hex as the "first frame").
  * The Spark-side plumbing — binary columns, metadata struct, typed
  * partition-wise decode, batch shape — is real and oracle-tested.
  */
object Multimodal {

  case class MediaMeta(format: String, width: Int, height: Int)
  case class MediaItem(id: Long, source: String, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(id: Long, source: String, nBytes: Long, checksum: Long,
      frameHex: String, width: Int, height: Int)

  /** Build a media table from any (id, source, text) frame: payload =
    * UTF-8 bytes (stand-in for encoded media), metadata derived
    * deterministically from the id.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaItem] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("id"),
        col("source"),
        col("text").cast("binary").as("payload"),
        struct(
          lit("fake/raw").as("format"),
          (pmod(col("doc_id"), lit(8)) * 160 + 320).cast("int").as("width"),
          (pmod(col("doc_id"), lit(8)) * 90 + 180).cast("int").as("height")).as("meta"))
      .as[MediaItem]
  }

  /** Partition-wise "decode": one MessageDigest per partition (the
    * expensive-codec-initialization pattern), then a streaming pass over
    * rows. Checksum = first 60 bits of md5(payload); frameHex = first
    * 16 payload bytes, uppercase hex ("frame sample").
    */
  def decodeFeatures(media: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { items =>
      val md = MessageDigest.getInstance("MD5")
      items.map { m =>
        md.reset()
        val digest = md.digest(m.payload)
        val hex = digest.map(b => f"$b%02x").mkString
        val checksum = java.lang.Long.parseLong(hex.substring(0, 15), 16)
        val frame = m.payload.take(16).map(b => f"$b%02X").mkString
        MediaFeatures(m.id, m.source, m.payload.length.toLong, checksum,
          frame, m.meta.width, m.meta.height)
      }
    }
  }
}
