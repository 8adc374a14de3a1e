package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads ride through the engine
  * as opaque `binary` columns with typed metadata alongside — the same
  * pattern as the reference's opaque S3 object relay (SURVEY §1.1.2), but
  * in-table so the relational operators (filter/join/group) compose with
  * media rows.
  *
  * The decode step parses two REAL public container formats from raw
  * bytes — binary PPM (netpbm P6: ASCII header `P6\n<w> <h>\n<maxval>\n`
  * then w*h*3 pixel bytes) and canonical RIFF/WAVE (44-byte little-endian
  * header: fmt chunk with channels/sample-rate/bit-depth, then the data
  * chunk) — so [[decodeFeatures]] extracts genuine information from the
  * payload and validates container integrity (declared pixel/sample byte
  * counts against actual payload length). Payloads that match neither
  * magic are passed through as raw bytes. Heavier codecs (JPEG entropy
  * decode, MP3) would slot into the same [[parseMeta]] seam; the
  * mapPartitions batching, schema, and partition-inherited parallelism
  * around it are the production shape either way.
  */
object Multimodal {

  /** A media record: opaque payload + typed metadata. */
  final case class MediaRecord(
      mediaId: Long, modality: String, payload: Array[Byte])

  /** Parsed container metadata. `d1/d2/d3` are format-specific:
    * ppm → (width, height, maxval); wav → (channels, sampleRate,
    * bitsPerSample); raw → (nBytes, 0, 0). */
  final case class MediaMeta(
      mediaId: Long, codec: String, nBytes: Long, d1: Long, d2: Long, d3: Long)

  /** documents → media table: payload = utf-8 bytes, modality assigned
    * deterministically (doc_id mod 3). The binary column is the point —
    * downstream operators must not assume text. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      expr("CASE doc_id % 3 WHEN 0 THEN 'text' WHEN 1 THEN 'image' ELSE 'audio' END")
        .as("modality"),
      // null text -> empty payload (mirrors encodeMedia's guard) — a
      // NULL payload would NPE every downstream byte-level parser
      encode(coalesce(col("text"), lit("")), "utf-8").as("payload"))

  // ------------------------------------------------------------- encoders

  /** Cycle `src` bytes to exactly `n` bytes (zero-fill if `src` empty). */
  private def cycled(src: Array[Byte], n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    if (src.nonEmpty) {
      var i = 0
      while (i < n) { out(i) = src(i % src.length); i += 1 }
    }
    out
  }

  /** Binary PPM (netpbm P6): ASCII header + w*h*3 raw pixel bytes.
    * Only 1-byte samples are supported, so maxval is capped at 255 — the
    * netpbm spec mandates 2-byte big-endian samples above that, and
    * emitting a >255 maxval with 1-byte data would be malformed for
    * external readers (parseMeta's length check rejects such files). */
  def encodePpm(width: Int, height: Int, pixels: Array[Byte],
      maxval: Int = 255): Array[Byte] = {
    require(pixels.length == width * height * 3, "pixel buffer size mismatch")
    require(maxval > 0 && maxval <= 255,
      s"invalid maxval $maxval: only 1-byte samples (maxval <= 255) supported")
    val header = s"P6\n$width $height\n$maxval\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    header ++ pixels
  }

  /** Canonical 44-byte RIFF/WAVE PCM header + sample data. */
  def encodeWav(channels: Int, sampleRate: Int, bitsPerSample: Int,
      data: Array[Byte]): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    require(data.length % blockAlign == 0, "data not a whole number of frames")
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + data.length).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1.toShort) // PCM
    bb.putShort(channels.toShort).putInt(sampleRate)
    bb.putInt(sampleRate * blockAlign).putShort(blockAlign.toShort)
    bb.putShort(bitsPerSample.toShort)
    bb.put("data".getBytes).putInt(data.length).put(data)
    bb.array()
  }

  /** documents → media table with REAL container payloads, parameters
    * derived deterministically from doc_id so an independent engine can
    * predict the parse result without running the codec:
    *   doc_id % 3 == 1 → PPM, w = 1+doc_id%7, h = 1+doc_id%5, pixels =
    *     text bytes cycled;
    *   doc_id % 3 == 2 → WAV, channels = 1+doc_id%2, rate =
    *     8000+1000*(doc_id%5), bits = 8|16 (doc_id%4<2 → 8), frames =
    *     1+doc_id%9, samples = text bytes cycled;
    *   else raw utf-8 text bytes. */
  def encodeMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      val bytes = Option(text).getOrElse("").getBytes(java.nio.charset.StandardCharsets.UTF_8)
      (id % 3) match {
        case 1 =>
          val w = (1 + id % 7).toInt; val h = (1 + id % 5).toInt
          MediaRecord(id, "image", encodePpm(w, h, cycled(bytes, w * h * 3)))
        case 2 =>
          val channels = (1 + id % 2).toInt
          val rate = (8000 + 1000 * (id % 5)).toInt
          val bits = if (id % 4 < 2) 8 else 16
          val frames = (1 + id % 9).toInt
          MediaRecord(id, "audio",
            encodeWav(channels, rate, bits, cycled(bytes, frames * channels * bits / 8)))
        case _ => MediaRecord(id, "text", bytes)
      }
    }.toDF().withColumnRenamed("mediaId", "media_id")
  }

  // -------------------------------------------------------------- decoder

  /** Parse one payload from raw bytes only (no metadata peeking). Sniffs
    * the container magic, reads the real header fields, and validates the
    * declared payload geometry against the actual byte count — a
    * truncated or corrupt container parses as `raw`, never as a plausible
    * lie. */
  def parseMeta(id: Long, payload: Array[Byte]): MediaMeta = {
    def raw = MediaMeta(id, "raw", payload.length.toLong, payload.length.toLong, 0L, 0L)
    if (payload.length >= 2 && payload(0) == 'P' && payload(1) == '6') {
      // netpbm P6: three ASCII ints (w, h, maxval) separated by whitespace
      var i = 2
      def nextInt(): Long = {
        while (i < payload.length && payload(i).toChar.isWhitespace) i += 1
        val start = i
        while (i < payload.length && payload(i).toChar.isDigit) i += 1
        // a digit run past 9 chars can't be a sane dimension and would
        // overflow Long well before that — corrupt, parse as raw
        if (i == start || i - start > 9) -1L
        else new String(payload, start, i - start).toLong
      }
      val (w, h, maxval) = (nextInt(), nextInt(), nextInt())
      i += 1 // the single whitespace byte terminating the header
      // bound w*h so the geometry product cannot overflow
      if (w > 0 && h > 0 && w <= 1000000 && h <= 1000000 &&
          maxval > 0 && maxval < 65536 &&
          payload.length - i == w * h * 3) MediaMeta(id, "ppm", payload.length.toLong, w, h, maxval)
      else raw
    } else if (payload.length >= 44 &&
        new String(payload, 0, 4, "US-ASCII") == "RIFF" &&
        new String(payload, 8, 4, "US-ASCII") == "WAVE" &&
        new String(payload, 12, 4, "US-ASCII") == "fmt " &&
        new String(payload, 36, 4, "US-ASCII") == "data") {
      val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val audioFormat = bb.getShort(20)
      val channels = bb.getShort(22).toLong
      val rate = bb.getInt(24).toLong
      val blockAlign = bb.getShort(32).toLong
      val bits = bb.getShort(34).toLong
      val dataLen = bb.getInt(40).toLong
      if (audioFormat == 1 && channels > 0 && bits % 8 == 0 &&
          blockAlign == channels * bits / 8 &&
          payload.length - 44L == dataLen)
        MediaMeta(id, "wav", payload.length.toLong, channels, rate, bits)
      else raw
    } else raw
  }

  /** Distributed decode: typed Dataset + mapPartitions — each task parses
    * its partition's records in one pass. Partition count (and therefore
    * decode parallelism) is inherited from the upstream scan. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, payload) => parseMeta(id, payload) })
      .toDF().withColumnRenamed("mediaId", "media_id")
  }

  /** Opaque-object scan: every file under the glob as (path, length,
    * content) — Spark's binaryFile source; the DataFrame analog of the
    * reference's S3 object listing (SURVEY §2.1 S4). */
  def binaryObjects(spark: SparkSession, glob: String): DataFrame =
    spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("length"), col("content"))

  // --------------------------------------------------- media transforms

  /** Nearest-neighbor resize of a P6 payload to (tw, th) — integer
    * index arithmetic only, so the output bytes are deterministic on
    * any engine/platform. Non-PPM or corrupt payloads yield None (the
    * caller decides drop-vs-passthrough; silent garbage never flows). */
  def resizePpm(payload: Array[Byte], tw: Int, th: Int): Option[Array[Byte]] = {
    require(tw > 0 && th > 0, "target dims must be positive")
    val meta = parseMeta(0L, payload)
    if (meta.codec != "ppm") None
    else {
      val (w, h) = (meta.d1.toInt, meta.d2.toInt)
      val off = payload.length - w * h * 3 // header length
      val out = new Array[Byte](tw * th * 3)
      var y = 0
      while (y < th) {
        val sy = (y.toLong * h / th).toInt
        var x = 0
        while (x < tw) {
          val sx = (x.toLong * w / tw).toInt
          val si = off + (sy * w + sx) * 3
          val di = (y * tw + x) * 3
          out(di) = payload(si); out(di + 1) = payload(si + 1)
          out(di + 2) = payload(si + 2)
          x += 1
        }
        y += 1
      }
      // carry the SOURCE maxval: samples are copied verbatim, so a
      // rewritten intensity scale would silently re-grade every pixel
      Some(encodePpm(tw, th, out, meta.d3.toInt))
    }
  }

  /** Frame-sample a PCM WAV payload: keep every `stride`-th frame (a
    * frame = one blockAlign of bytes across channels) — the audio
    * analog of video frame sampling; the sample rate divides by the
    * stride so duration semantics survive. Non-WAV yields None. */
  def sampleWavFrames(payload: Array[Byte], stride: Int): Option[Array[Byte]] = {
    require(stride > 0, "stride must be positive")
    val meta = parseMeta(0L, payload)
    if (meta.codec != "wav") None
    else {
      val channels = meta.d1.toInt
      val rate = meta.d2.toInt
      val bits = meta.d3.toInt
      val blockAlign = channels * bits / 8
      val nFrames = (payload.length - 44) / blockAlign
      val kept = (0 until nFrames by stride).toArray
      val out = new Array[Byte](kept.length * blockAlign)
      var j = 0
      while (j < kept.length) {
        System.arraycopy(payload, 44 + kept(j) * blockAlign,
          out, j * blockAlign, blockAlign)
        j += 1
      }
      Some(encodeWav(channels, math.max(1, rate / stride), bits, out))
    }
  }

  /** Distributed media transform: images resize to (tw, th), audio
    * frame-samples at `stride`, text passes through — one mapPartitions
    * pass (byte parsing is genuine per-record imperative work; the
    * Python-ecosystem equivalent is a pandas UDF over mapInPandas, same
    * batch shape). Corrupt containers pass through UNCHANGED rather
    * than vanish: a 100 TB curation run wants the quarantine decision
    * downstream, not silent row loss here. */
  def transformMedia(media: DataFrame, tw: Int, th: Int, stride: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("modality"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, modality, payload) =>
        val out = modality match {
          case "image" => resizePpm(payload, tw, th).getOrElse(payload)
          case "audio" => sampleWavFrames(payload, stride).getOrElse(payload)
          case _ => payload
        }
        MediaRecord(id, modality, out)
      })
      .toDF().withColumnRenamed("mediaId", "media_id")
  }
}
