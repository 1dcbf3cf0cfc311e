package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §7.5): treat image/audio/video
  * payloads as opaque `binary` columns with typed metadata, and run
  * decode / feature-extraction as a distributed per-partition batch
  * transform.
  *
  * The Spark-side plumbing — schema, partitioning, batch shape — is
  * real and tested. Images have a REAL decode path (`decodeImages`,
  * JDK-built-in javax.imageio: PNG/JPEG/BMP/GIF) and so does audio
  * (`decodeAudio`, JDK-built-in javax.sound.sampled: WAV/AU/AIFF
  * PCM) — no external libraries either way. Video remains stubbed
  * (`decodeStub` derives deterministic fake features; the container
  * has no video codec) — swap in a real codec without touching the
  * plan.
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
