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
  * Image decode is REAL: [[decodeImageStats]] runs
  * `javax.imageio.ImageIO.read` (public JDK API — pure-Java PNG/JPEG
  * plugins, headless-safe) inside the partition-wise kernel, and
  * [[encodeTestImage]] produces genuinely PNG/JPEG-compressed blobs
  * for it. [[decodeFeatures]] remains the deterministic-fake fallback
  * for codec-less payloads (audio/video, where this container has no
  * decoder): payload length, md5-derived checksum, head-bytes hex.
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

  case class ResizedMedia(id: Long, outW: Int, outH: Int, nBytes: Int, checksum: Long)
  case class FrameSample(id: Long, nFrames: Int, nSampled: Int, checksum: Long)

  private def hash60(md: MessageDigest, bytes: Array[Byte]): Long = {
    md.reset()
    val dg = md.digest(bytes)
    var a = 0L
    var k = 0
    while (k < 7) { a = (a << 8) | (dg(k) & 0xffL); k += 1 }
    (a << 4) | ((dg(7) & 0xf0L) >> 4)
  }

  /** Nearest-neighbor "resize": the payload is treated as a
    * meta.width × meta.height row-major raster (indices wrap modulo the
    * payload length — the stand-in for real pixel data); output pixel
    * (r,c) samples source pixel (r·h/newH, c·w/newW). Real byte-level
    * resampling in a partition-wise kernel — swap the sampling loop
    * for libjpeg/swscale when codecs exist. Output carries the
    * resampled byte count and a 60-bit md5 checksum of the new
    * payload so the resample is oracle-verifiable.
    */
  def resizeNearest(media: Dataset[MediaItem], newW: Int, newH: Int): Dataset[ResizedMedia] = {
    require(newW > 0 && newH > 0, s"target dimensions must be positive, got ${newW}x$newH")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { items =>
      val md = MessageDigest.getInstance("MD5")
      items.map { m =>
        val len = m.payload.length
        val out = new Array[Byte](newW * newH)
        // empty payload → all-zero raster (instead of a per-row
        // ArithmeticException from src % 0 inside the executor kernel)
        var i = 0
        while (len > 0 && i < out.length) {
          val r = i / newW
          val c = i % newW
          val src = (r * m.meta.height / newH) * m.meta.width + (c * m.meta.width / newW)
          out(i) = m.payload(src % len)
          i += 1
        }
        ResizedMedia(m.id, newW, newH, out.length, hash60(md, out))
      }
    }
  }

  /** Video-style frame sampling: the payload splits into consecutive
    * `frameSize`-byte frames; every `everyK`-th frame (0, k, 2k, …) is
    * kept and concatenated. Output = frame counts + a 60-bit md5
    * checksum of the sampled bytes. The partition-wise byte plumbing is
    * real; a real pipeline would hand each kept frame to a decoder.
    */
  def frameSample(media: Dataset[MediaItem], frameSize: Int, everyK: Int): Dataset[FrameSample] = {
    require(frameSize > 0, s"frameSize must be positive, got $frameSize")
    require(everyK > 0, s"everyK must be positive, got $everyK")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { items =>
      val md = MessageDigest.getInstance("MD5")
      items.map { m =>
        val nFrames = (m.payload.length + frameSize - 1) / frameSize
        val buf = new java.io.ByteArrayOutputStream()
        var f = 0
        var n = 0
        while (f < nFrames) {
          if (f % everyK == 0) {
            val start = f * frameSize
            buf.write(m.payload, start, math.min(frameSize, m.payload.length - start))
            n += 1
          }
          f += 1
        }
        FrameSample(m.id, nFrames, n, hash60(md, buf.toByteArray))
      }
    }
  }

  case class ImageStats(id: Long, format: String, width: Int, height: Int,
      sumR: Long, sumG: Long, sumB: Long, nPx: Long, ok: Boolean)

  /** Deterministic RGB test-pattern raster, encoded with a REAL codec:
    * pixel (x, y) of image `id` is
    * (r, g, b) = ((x+id)%256, (y+2·id)%256, (x+y+3·id)%256),
    * PNG- or JPEG-compressed via `javax.imageio` (public JDK API; the
    * PNG/JPEG plugins are pure-Java and headless-safe). PNG is
    * lossless, so a decode of this blob must reproduce the formula
    * exactly — which is what lets a SQL oracle check the decoder
    * bit-for-bit without any image library of its own.
    */
  def encodeTestImage(id: Long, w: Int, h: Int, format: String): Array[Byte] = {
    require(w > 0 && h > 0, s"image dims must be positive, got ${w}x$h")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((x + id) % 256).toInt
        val g = ((y + 2 * id) % 256).toInt
        val b = ((x + y + 3 * id) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(img, format, bos))
      throw new java.io.IOException(s"no imageio writer for format $format")
    bos.toByteArray
  }

  /** REAL image decode — `javax.imageio.ImageIO.read` over binary
    * blobs in a partition-wise kernel (the same shape as the
    * deterministic-fake [[decodeFeatures]], which stays as the
    * no-codec fallback). Emits per-blob (width, height, per-channel
    * pixel sums): exact integers, so a lossless format's output is
    * oracle-checkable against the generating formula, and any format's
    * dimensions check the header/decode path. Undecodable payloads
    * yield an `ok=false` row — quarantine accounting, never a job
    * failure (the crawl-ingest posture).
    *
    * @param blobs (id, format, content) rows — e.g. `binaryFile` reads
    *   with the id/format parsed from the path
    */
  def decodeImageStats(blobs: Dataset[(Long, String, Array[Byte])]): Dataset[ImageStats] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { rows =>
      rows.map { case (id, format, bytes) =>
        try {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          if (img == null) ImageStats(id, format, -1, -1, 0L, 0L, 0L, 0L, ok = false)
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            var sr = 0L; var sg = 0L; var sb = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                sr += (rgb >> 16) & 0xff
                sg += (rgb >> 8) & 0xff
                sb += rgb & 0xff
                x += 1
              }
              y += 1
            }
            ImageStats(id, format, w, h, sr, sg, sb, w.toLong * h, ok = true)
          }
        } catch {
          case _: Exception => ImageStats(id, format, -1, -1, 0L, 0L, 0L, 0L, ok = false)
        }
      }
    }
  }

  case class ImageHash(id: Long, hashHi: Long, hashLo: Long, nOnes: Long, ok: Boolean)

  /** Perceptual average-hash (aHash) over REAL decoded images — the
    * image near-duplicate primitive: decode via `javax.imageio`,
    * nearest-neighbor downsample to 8×8 (sample pixel
    * (j·w/8, i·h/8) — integer arithmetic only, no resampling filter,
    * so an oracle can recompute it), brightness = r+g+b per cell (sum,
    * never divided — keeps everything exact integers), bit(i,j) = 1
    * iff 64·brightness(i,j) > Σ brightness (strictly-greater-than-mean
    * without a division). The 64 bits are packed into TWO longs
    * (rows 0–3 → `hashLo`, rows 4–7 → `hashHi`, bit (i·8+j) within
    * each half) — two 32-bit halves sidestep sign-bit arithmetic in
    * SQL engines and are the natural unit for pigeonhole chunk joins.
    * Near-dup pairs then come from Hamming distance over the halves —
    * same banded-join machinery as SimHash, but over pixel content
    * instead of token content. Undecodable blobs yield ok=false.
    */
  def aHash(blobs: Dataset[(Long, Array[Byte])]): Dataset[ImageHash] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { rows =>
      rows.map { case (id, bytes) =>
        try {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          if (img == null) ImageHash(id, 0L, 0L, 0L, ok = false)
          else {
            val w = img.getWidth
            val h = img.getHeight
            val gray = new Array[Long](64)
            var tot = 0L
            var i = 0
            while (i < 8) {
              var j = 0
              while (j < 8) {
                val rgb = img.getRGB(j * w / 8, i * h / 8)
                val g = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                gray(i * 8 + j) = g
                tot += g
                j += 1
              }
              i += 1
            }
            var lo = 0L
            var hi = 0L
            var ones = 0L
            var p = 0
            while (p < 64) {
              if (64L * gray(p) > tot) {
                ones += 1
                if (p < 32) lo |= 1L << p else hi |= 1L << (p - 32)
              }
              p += 1
            }
            ImageHash(id, hi, lo, ones, ok = true)
          }
        } catch {
          case _: Exception => ImageHash(id, 0L, 0L, 0L, ok = false)
        }
      }
    }
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

  case class AudioFeatures(id: Long, source: String, nSamples: Long, nWindows: Long,
      zeroCrossings: Long, meanRms: Double, nSilent: Long)

  /** Audio feature extraction over the payload treated as 8-bit
    * unsigned PCM (the deterministic stand-in — swap the sample loop
    * for an ffmpeg/JNI decoder when codecs exist; the Spark-side
    * plumbing — binary column in, partition-wise kernel, typed feature
    * row out — is the real shape). Per item: sample count, full
    * `window`-sample frames, zero crossings around `center`, mean
    * per-window RMS energy, and frames whose RMS falls below
    * `silenceRms` (the silence-trim signal). Pure integer/closed-form
    * double math — oracle-reproducible byte for byte.
    */
  def audioEnergy(media: Dataset[MediaItem], window: Int, center: Int,
      silenceRms: Double): Dataset[AudioFeatures] = {
    require(window >= 1, s"window must be >= 1, got $window")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { items =>
      items.map { m =>
        val p = m.payload
        val n = p.length
        var zc = 0L
        var i = 1
        while (i < n) {
          val a = (p(i - 1) & 0xff) - center
          val b = (p(i) & 0xff) - center
          if (a * b < 0) zc += 1
          i += 1
        }
        val nw = n / window
        var rmsSum = 0.0
        var silent = 0L
        var w0 = 0
        while (w0 < nw) {
          var ss = 0L
          var j = w0 * window
          val end = j + window
          while (j < end) {
            val v = (p(j) & 0xff) - center
            ss += v.toLong * v
            j += 1
          }
          val rms = math.sqrt(ss.toDouble / window)
          rmsSum += rms
          if (rms < silenceRms) silent += 1
          w0 += 1
        }
        AudioFeatures(m.id, m.source, n.toLong, nw.toLong, zc,
          if (nw > 0) rmsSum / nw else 0.0, silent)
      }
    }
  }

  case class MotionFeatures(id: Long, source: String, nFrames: Long,
      meanMotion: Double, maxMotion: Double, nStill: Long)

  /** Video frame-motion features over the payload treated as
    * consecutive `frameSize`-byte frames (the deterministic stand-in —
    * the real shape is identical with an ffmpeg frame iterator):
    * per-transition motion = mean |byte delta| between consecutive
    * frames; per item the mean and max transition motion plus
    * near-still transitions (motion < `stillBelow`) — the
    * scene-cut / static-content signal video curation filters on.
    */
  def frameMotion(media: Dataset[MediaItem], frameSize: Int,
      stillBelow: Double): Dataset[MotionFeatures] = {
    require(frameSize >= 1, s"frameSize must be >= 1, got $frameSize")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { items =>
      items.map { m =>
        val p = m.payload
        val nf = p.length / frameSize
        var sumM = 0.0
        var maxM = 0.0
        var still = 0L
        var f = 1
        while (f < nf) {
          var acc = 0L
          var j = 0
          while (j < frameSize) {
            val d = (p(f * frameSize + j) & 0xff) - (p((f - 1) * frameSize + j) & 0xff)
            acc += math.abs(d)
            j += 1
          }
          val mo = acc.toDouble / frameSize
          sumM += mo
          if (mo > maxM) maxM = mo
          if (mo < stillBelow) still += 1
          f += 1
        }
        val nt = nf - 1
        MotionFeatures(m.id, m.source, nf.toLong,
          if (nt > 0) sumM / nt else 0.0, maxM, still)
      }
    }
  }

  case class ChannelStats(id: Long, source: String, channel: Int, n: Long,
      sum: Long, sumSq: Long, min: Int, max: Int)

  /** Per-channel byte statistics over the payload treated as an
    * interleaved raster (position mod `channels` = channel index — the
    * R/G/B plane split of a raw frame; the real shape is identical
    * after an image decoder). One row per (item, channel) carrying the
    * exact integer count / sum / sum-of-squares / min / max — the
    * distributive partials any downstream mean/variance/contrast
    * aggregate composes from without revisiting the bytes.
    */
  def channelStats(media: Dataset[MediaItem], channels: Int): Dataset[ChannelStats] = {
    require(channels >= 1, s"channels must be >= 1, got $channels")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { items =>
      items.flatMap { m =>
        val p = m.payload
        val n = new Array[Long](channels)
        val sm = new Array[Long](channels)
        val sq = new Array[Long](channels)
        val mn = Array.fill(channels)(Int.MaxValue)
        val mx = Array.fill(channels)(Int.MinValue)
        var i = 0
        while (i < p.length) {
          val ch = i % channels
          val v = p(i) & 0xff
          n(ch) += 1
          sm(ch) += v
          sq(ch) += v.toLong * v
          if (v < mn(ch)) mn(ch) = v
          if (v > mx(ch)) mx(ch) = v
          i += 1
        }
        (0 until channels).iterator.filter(c => n(c) > 0).map(c =>
          ChannelStats(m.id, m.source, c, n(c), sm(c), sq(c), mn(c), mx(c)))
      }
    }
  }
}
