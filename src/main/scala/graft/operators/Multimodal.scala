package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §7.5): treat image/audio/video
  * payloads as opaque `binary` columns with typed metadata, and run
  * decode / feature-extraction as a distributed per-partition batch
  * transform.
  *
  * The Spark-side plumbing — schema, partitioning, batch shape — is
  * real and tested. The codec itself is a STUB: the container has no
  * image/audio libraries, so `decodeStub` derives deterministic fake
  * features from the bytes. Swap `decodeStub` for a real codec (JNI /
  * process-pool) without touching the surrounding plan.
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
