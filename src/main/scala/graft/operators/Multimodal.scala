package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §7.5): treat image/audio/video
  * payloads as opaque `binary` columns with typed metadata, and run
  * decode / feature-extraction as a distributed per-partition batch
  * transform.
  *
  * The Spark-side plumbing — schema, partitioning, batch shape — is
  * real and tested, and so are all three modality decoders, each on
  * JDK-builtins only: images (`decodeImages`, javax.imageio:
  * PNG/JPEG/BMP/GIF), audio (`decodeAudio`, javax.sound.sampled:
  * WAV/AU/AIFF PCM), and video (`decodeVideoMjpeg`, RIFF/AVI container
  * walk + javax.imageio per MJPEG frame). Codecs the JVM cannot decode
  * (H.264, mp3, …) would slot into `decodeStub`'s batch shape behind
  * an external library without touching the plan.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String)
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Int, width: Int, height: Int,
      n_frames: Int, feature_hash: Long)

  /** Wrap a text column as a binary payload + metadata struct — the
    * ingest shape a real multimodal pipeline would carry. */
  def attachPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        octet_length(col(textCol).cast("binary")).as("n_bytes"),
        lit("application/octet-stream").as("mime")).as("meta"))

  final case class ImageFeatures(
      doc_id: Long, width: Int, height: Int, n_pixels: Long,
      mean_luma: Double, format: String)

  /** REAL image decode via the JDK's javax.imageio — dimensions, pixel
    * count, mean Rec.601 luminance, sniffed format. Undecodable
    * payloads are dropped (flatMap), mirroring a production pipeline's
    * corrupt-file policy. Pixel access is bulk (`getRGB` row batch);
    * per-partition init amortizes reader machinery like any codec
    * batch. Runs entirely on executors. */
  def decodeImages(spark: SparkSession, media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) { iis.close(); None }
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val fmt = reader.getFormatName.toLowerCase
            val img = reader.read(0)
            val w = img.getWidth
            val h = img.getHeight
            val px = img.getRGB(0, 0, w, h, null, 0, w)
            var sum = 0.0
            var i = 0
            while (i < px.length) {
              val rgb = px(i)
              sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
                0.114 * (rgb & 0xff)
              i += 1
            }
            Some(ImageFeatures(r.doc_id, w, h, w.toLong * h,
              math.round(sum / px.length * 100) / 100.0, fmt))
          } catch { case _: Exception => None }
          finally { reader.dispose(); iis.close() }
        }
      }
    }
  }

  final case class AudioFeatures(
      doc_id: Long, sample_rate: Int, channels: Int, bits: Int,
      n_frames: Long, duration_ms: Long, rms: Double)

  /** REAL audio decode via the JDK's javax.sound.sampled — WAV/AU/AIFF
    * PCM without external libraries: format parameters, frame count,
    * duration, and RMS amplitude (normalized to [0,1]) over the PCM
    * samples. Undecodable payloads are dropped like corrupt images.
    * Compressed formats (mp3/ogg) have no JDK codec and would slot in
    * here behind the same batch shape. */
  def decodeAudio(spark: SparkSession, media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          try {
            val fmt = ais.getFormat
            val bits = fmt.getSampleSizeInBits
            val frames = ais.getFrameLength
            val data = ais.readAllBytes()
            val big = fmt.isBigEndian
            var sumSq = 0.0
            var n = 0
            if (bits == 16) {
              var i = 0
              while (i + 1 < data.length) {
                val lo = data(if (big) i + 1 else i) & 0xff
                val hi = data(if (big) i else i + 1)
                val s = ((hi << 8) | lo).toShort / 32768.0
                sumSq += s * s; n += 1; i += 2
              }
            } else { // 8-bit PCM (signed or unsigned per encoding)
              val signed = fmt.getEncoding ==
                javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
              var i = 0
              while (i < data.length) {
                val s = (if (signed) data(i).toDouble
                         else (data(i) & 0xff) - 128.0) / 128.0
                sumSq += s * s; n += 1; i += 1
              }
            }
            val rms = if (n == 0) 0.0
              else math.round(math.sqrt(sumSq / n) * 1e6) / 1e6
            Some(AudioFeatures(r.doc_id, fmt.getSampleRate.toInt,
              fmt.getChannels, bits, frames,
              math.round(frames * 1000.0 / fmt.getSampleRate), rms))
          } finally ais.close()
        } catch { case _: Exception => None }
      }
    }
  }

  final case class VideoFeatures(
      doc_id: Long, n_frames: Int, width: Int, height: Int,
      fps: Double, mean_luma: Double)

  /** REAL video decode for MJPEG-in-AVI — the one video format a bare
    * JVM can fully decode (RIFF container walk per the public AVI spec;
    * each `..dc` frame chunk is a JPEG handed to javax.imageio).
    * Emits frame count, dimensions from the first frame, fps from the
    * `avih` main header, and mean Rec.601 luminance across all frames.
    * Non-AVI / non-MJPEG / corrupt payloads are dropped, mirroring the
    * image and audio corrupt-file policy; other codecs (H.264 etc.)
    * have no JVM decoder and would slot into `decodeStub`'s batch
    * shape behind an external library. */
  /** RIFF-AVI container walk shared by [[decodeVideoMjpeg]] and
    * [[sampleFrames]]: (µs per frame from `avih`, (offset, length) of
    * each `..dc` MJPEG frame chunk). Empty frames ⇒ not an MJPEG AVI. */
  private def aviFrameChunks(b: Array[Byte]): (Long, Seq[(Int, Int)]) = {
    def le32(p: Int): Long =
      (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
        ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
    def tag(p: Int): String =
      new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (b.length < 12 || tag(0) != "RIFF" || tag(8) != "AVI ") (0L, Seq.empty)
    else {
      var usPerFrame = 0L
      val frames = scala.collection.mutable.ArrayBuffer[(Int, Int)]() // (off, len)
      def walk(start: Int, end: Int): Unit = {
        var p = start
        while (p + 8 <= end) {
          val id = tag(p)
          val sz = math.min(le32(p + 4), (end - p - 8).toLong).toInt
          if (id == "LIST" && sz >= 4) walk(p + 12, p + 8 + sz)
          else if (id == "avih" && sz >= 4) usPerFrame = le32(p + 8)
          else if (id.length == 4 && id.endsWith("dc") && sz > 2)
            frames += ((p + 8, sz))
          p += 8 + sz + (sz & 1)
        }
      }
      walk(12, b.length)
      (usPerFrame, frames.toSeq)
    }
  }

  def decodeVideoMjpeg(spark: SparkSession, media: Dataset[MediaRow]): Dataset[VideoFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        try {
          val b = r.payload
          val (usPerFrame, frames) = aviFrameChunks(b)
          if (frames.isEmpty) None
          else {
            var w = 0; var h = 0
            var lumaSum = 0.0; var nPx = 0L
            frames.foreach { case (off, len) =>
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(b, off, len))
              if (img != null) {
                if (w == 0) { w = img.getWidth; h = img.getHeight }
                val px = img.getRGB(0, 0, img.getWidth, img.getHeight,
                  null, 0, img.getWidth)
                var i = 0
                while (i < px.length) {
                  val rgb = px(i)
                  lumaSum += 0.299 * ((rgb >> 16) & 0xff) +
                    0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                  i += 1
                }
                nPx += px.length
              }
            }
            if (w == 0 || nPx == 0L) None
            else Some(VideoFeatures(r.doc_id, frames.size, w, h,
              if (usPerFrame > 0) math.round(1e8 / usPerFrame) / 100.0 else 0.0,
              math.round(lumaSum / nPx * 100) / 100.0))
          }
        } catch { case _: Exception => None }
      }
    }
  }

  final case class ResizedImage(
      doc_id: Long, width: Int, height: Int, n_bytes: Int,
      mean_luma: Double, payload: Array[Byte])

  /** REAL image resize via Graphics2D bilinear scaling, re-encoded as
    * PNG — the resolution-normalization stage of a multimodal training
    * pipeline, chainable into [[decodeImages]] (the output payload is
    * a valid image). Same batch shape and corrupt-file policy as the
    * decoders: mapPartitions on executors, undecodable payloads
    * dropped. */
  def resizeImages(spark: SparkSession, media: Dataset[MediaRow],
      targetW: Int, targetH: Int): Dataset[ResizedImage] = {
    require(targetW > 0 && targetH > 0, s"target dims must be positive: ${targetW}x$targetH")
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        try {
          val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          if (src == null) None
          else {
            val dst = new java.awt.image.BufferedImage(
              targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = dst.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(src, 0, 0, targetW, targetH, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", bos)
            val out = bos.toByteArray
            val px = dst.getRGB(0, 0, targetW, targetH, null, 0, targetW)
            var sum = 0.0
            var i = 0
            while (i < px.length) {
              val rgb = px(i)
              sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
                0.114 * (rgb & 0xff)
              i += 1
            }
            Some(ResizedImage(r.doc_id, targetW, targetH, out.length,
              math.round(sum / px.length * 100) / 100.0, out))
          }
        } catch { case _: Exception => None }
      }
    }
  }

  final case class FrameSample(
      doc_id: Long, frame_idx: Int, width: Int, height: Int, mean_luma: Double)

  /** REAL video frame sampling: every `everyN`-th MJPEG frame of an
    * AVI payload decoded to per-frame features — the keyframe-sampling
    * stage a video training pipeline runs before captioning/embedding
    * (sampling happens at the CONTAINER level, so skipped frames are
    * never JPEG-decoded; for a 30 fps corpus sampled at 1/30 that is a
    * 30× decode saving, which is the point at 100 TB). */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRow],
      everyN: Int): Dataset[FrameSample] = {
    require(everyN >= 1, s"everyN must be >= 1: $everyN")
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        try {
          val b = r.payload
          val (_, frames) = aviFrameChunks(b)
          frames.iterator.zipWithIndex
            .filter { case (_, idx) => idx % everyN == 0 }
            .flatMap { case ((off, len), idx) =>
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(b, off, len))
              if (img == null) None
              else {
                val px = img.getRGB(0, 0, img.getWidth, img.getHeight,
                  null, 0, img.getWidth)
                var sum = 0.0
                var i = 0
                while (i < px.length) {
                  val rgb = px(i)
                  sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
                    0.114 * (rgb & 0xff)
                  i += 1
                }
                Some(FrameSample(r.doc_id, idx, img.getWidth, img.getHeight,
                  math.round(sum / px.length * 100) / 100.0))
              }
            }.toSeq
        } catch { case _: Exception => Seq.empty }
      }
    }
  }

  /** STUB decode: deterministic pseudo-features from the raw bytes.
    * Real implementation would decode image dims / sample frames here.
    * Runs as `mapPartitions` so a real codec amortizes per-partition
    * init (model load, library handle) exactly like a Pandas-UDF batch. */
  def decodeStub(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (e.g. codec handle)
      rows.map { r =>
        val n = r.payload.length
        var h = 0L
        var i = 0
        while (i < math.min(n, 16)) { h = (h * 31 + (r.payload(i) & 0xff)) % 1000000007L; i += 1 }
        MediaFeatures(r.doc_id, n, 1 + n % 640, 1 + (n * 7) % 480, 1 + n % 16, h)
      }
    }
  }
}
