package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads ride through the engine
  * as opaque `binary` columns with typed metadata alongside — the same
  * pattern as the reference's opaque S3 object relay (SURVEY §1.1.2), but
  * in-table so the relational operators (filter/join/group) compose with
  * media rows.
  *
  * The decode step is a STUB: real image/audio codecs are not available in
  * this container, so [[decodeFeatures]] derives a deterministic fake
  * feature vector from the payload bytes. Everything around the stub — the
  * schema, the per-partition batch iteration, the typed Dataset plumbing,
  * the binaryFile source — is the real Spark shape a production decoder
  * drops into (swap [[fakeFeature]] for the codec call).
  */
object Multimodal {

  /** A media record: opaque payload + typed metadata. */
  final case class MediaRecord(
      mediaId: Long, modality: String, payload: Array[Byte])

  final case class MediaFeatures(
      mediaId: Long, modality: String, nBytes: Int, features: Array[Float])

  /** documents → media table: payload = utf-8 bytes, modality assigned
    * deterministically (doc_id mod 3). The binary column is the point —
    * downstream operators must not assume text. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      expr("CASE doc_id % 3 WHEN 0 THEN 'text' WHEN 1 THEN 'image' ELSE 'audio' END")
        .as("modality"),
      encode(col("text"), "utf-8").as("payload"))

  /** STUB decoder: 16 deterministic floats from the payload's first bytes.
    * A real decoder (JPEG → pixels → CNN features, PCM → mel spectrogram)
    * replaces exactly this function; the mapPartitions batching around it
    * is production-shaped (one iterator pass, no per-row session work). */
  def fakeFeature(payload: Array[Byte], dim: Int = 16): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      val b: Int = if (payload.length > i) payload(i) & 0xff else 0
      out(i) = b.toFloat / 255.0f
      i += 1
    }
    out
  }

  /** Distributed decode: typed Dataset + mapPartitions — each task decodes
    * its partition's records in one pass. Partition count (and therefore
    * decode parallelism) is inherited from the upstream scan. */
  def decodeFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("modality"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, mod, payload) =>
          MediaFeatures(id, mod, payload.length, fakeFeature(payload, dim))
        }
      }
      .toDF()
  }

  /** Opaque-object scan: every file under the glob as (path, length,
    * content) — Spark's binaryFile source; the DataFrame analog of the
    * reference's S3 object listing (SURVEY §2.1 S4). */
  def binaryObjects(spark: SparkSession, glob: String): DataFrame =
    spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("length"), col("content"))
}
