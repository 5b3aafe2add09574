package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Opaque multimodal payload with typed metadata — the column-model for
  * image/audio/video at 100 TB: the media itself is a `binary` column
  * (never parsed by Catalyst, just moved), metadata is a typed struct that
  * IS visible to pruning/filter pushdown so scans can skip payloads by
  * metadata alone.
  */
case class MediaRecord(
    media_id: Long,
    payload: Array[Byte],
    media_type: String,
    source: String,
    declared_len: Long)

/** Decoded/extracted features. Real pipelines decode with native libs in a
  * batch-wise partition pass; this container has no codecs, so decode is a
  * DETERMINISTIC STUB (clearly marked below) — the Spark-side plumbing
  * (schema, batching, partition pass, feature shape) is real and tested.
  */
case class MediaFeatures(
    media_id: Long,
    byte_len: Long,
    first_byte: Int,
    width: Int,
    height: Int,
    n_frames: Int,
    byte_checksum: Long)

/** One sampled frame of a (stub-decoded) video payload. */
case class MediaFrame(
    media_id: Long,
    frame_idx: Int,
    frame_checksum: Long)

object MultiModal {

  /** Wrap a documents-like table into the media model (payload := utf-8
    * bytes of text — a stand-in for real image/audio bytes). */
  def toMediaRecords(documents: DataFrame): Dataset[MediaRecord] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      lit("image/stub").as("media_type"),
      col("source"),
      col("n_chars").as("declared_len")).as[MediaRecord]
  }

  /** Frame sampling: one input row fans out into `n_frames` frame rows —
    * the generator/explode shape of video pipelines (decode is stubbed;
    * the per-frame checksum chains off the real byte checksum, so the
    * fan-out is verifiable).
    */
  def sampleFrames(features: Dataset[MediaFeatures]): Dataset[MediaFrame] = {
    val spark = features.sparkSession
    import spark.implicits._
    features.flatMap { f =>
      (0 until f.n_frames).iterator.map { i =>
        MediaFrame(f.media_id, i, (f.byte_checksum * 31L + i) % 2147483647L)
      }
    }
  }

  /** REAL (not stubbed) image-container sniffing: format + pixel
    * dimensions parsed straight from the header BYTES with built-in
    * expressions — no codec library is needed to read a PNG IHDR, a
    * GIF logical-screen descriptor, or a BMP info header, and at
    * 100 TB this is the pass that runs FIRST (dimension/aspect/format
    * filters drop payloads before any decoder runs). Pure
    * `substring`/`hex`/`conv` over the binary column, so the whole
    * sniff stays in WholeStageCodegen in the scan stage — payload
    * bytes never leave the executor and nothing shuffles.
    *
    *  - PNG:  8-byte signature, then width/height as BIG-endian int32
    *    at offsets 16/20 of the IHDR.
    *  - GIF:  "GIF87a"/"GIF89a", width/height LITTLE-endian uint16 at
    *    offsets 6/8 (bytes reversed before conv).
    *  - BMP:  "BM", width/height little-endian int32 at offsets 18/22.
    *  - JPEG: canonical JFIF layout only — SOI, a 16-byte APP0
    *    ("JFIF\0"), then SOF0 immediately after: height/width
    *    BIG-endian uint16 at offsets 25/27. JPEGs with other segment
    *    orders (EXIF APP1, quantization tables before SOF0) return
    *    null and fall through to the decode queue — the conservative
    *    sniff contract (a full marker walk needs a loop, not a
    *    scan-stage expression).
    *
    * Returns struct(format, width, height); null for payloads that
    * match no container (the decode-queue routing key). */
  def imageDims(payload: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    // dimensions surface as LONG: a 4-byte field tops out at 2^32−1,
    // which overflows an ANSI int cast (Spark 4 default) — a corrupt
    // header would then CRASH the scan this function runs first on,
    // instead of parsing to an absurd value the downstream filter
    // drops. (NOTES ANSI rule: sniffing must never throw.)
    def beLong(off: Int, len: Int) =
      conv(hex(substring(payload, off, len)), 16, 10).cast("long")
    def leLong(off: Int, len: Int) = {
      val rev = (0 until len).reverse
        .map(i => hex(substring(payload, off + i, 1)))
      conv(concat(rev: _*), 16, 10).cast("long")
    }
    // BMP biHeight is SIGNED: negative = top-down row order (a
    // legitimate variant) — surface the magnitude
    def leSigned32(off: Int) = {
      val u = leLong(off, 4)
      when(u > 2147483647L, u - 4294967296L).otherwise(u)
    }
    val isPng = hex(substring(payload, 1, 8)) === "89504E470D0A1A0A"
    val isGif = substring(payload, 1, 4).cast("string") === "GIF8"
    val isBmp = substring(payload, 1, 2).cast("string") === "BM"
    val isJpeg = hex(substring(payload, 1, 2)) === "FFD8" &&
      hex(substring(payload, 3, 2)) === "FFE0" &&
      substring(payload, 7, 4).cast("string") === "JFIF" &&
      hex(substring(payload, 21, 2)) === "FFC0"
    when(isPng, struct(lit("png").as("format"),
        beLong(17, 4).as("width"), beLong(21, 4).as("height")))
      .when(isGif, struct(lit("gif").as("format"),
        leLong(7, 2).as("width"), leLong(9, 2).as("height")))
      .when(isBmp, struct(lit("bmp").as("format"),
        leSigned32(19).as("width"), abs(leSigned32(23)).as("height")))
      .when(isJpeg, struct(lit("jpeg").as("format"),
        beLong(28, 2).as("width"), beLong(26, 2).as("height")))
  }

  /** REAL (not stubbed) audio-container sniffing, [[imageDims]]'s
    * sibling for WAV: channel count, sample rate, bit depth, payload
    * size, and duration parsed straight from the RIFF header bytes —
    * the scan-stage routing/filter pass (drop >5-minute clips, route
    * by sample rate) that runs before any audio decoder. Canonical
    * PCM layout only ("fmt " as the first chunk at offset 13, "data"
    * at 37) — files with INFO/LIST chunks first return null and fall
    * through to the decode queue, which is the correct conservative
    * contract for a header sniff. All little-endian fields via the
    * byte-reverse + conv idiom; LONG arithmetic throughout (ANSI rule:
    * sniffing must never throw on corrupt bytes).
    *
    * Returns struct(channels, sample_rate, bits_per_sample,
    * n_data_bytes, duration_ms); duration is null when the byte rate
    * field is 0 (corrupt) rather than a division crash. */
  def wavMeta(payload: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    def leLong(off: Int, len: Int) = {
      val rev = (0 until len).reverse
        .map(i => hex(substring(payload, off + i, 1)))
      conv(concat(rev: _*), 16, 10).cast("long")
    }
    val isWav = substring(payload, 1, 4).cast("string") === "RIFF" &&
      substring(payload, 9, 4).cast("string") === "WAVE" &&
      substring(payload, 13, 4).cast("string") === "fmt " &&
      substring(payload, 37, 4).cast("string") === "data"
    val byteRate = leLong(29, 4)
    val dataBytes = leLong(41, 4)
    when(isWav, struct(
      leLong(23, 2).as("channels"),
      leLong(25, 4).as("sample_rate"),
      leLong(35, 2).as("bits_per_sample"),
      dataBytes.as("n_data_bytes"),
      when(byteRate > 0,
        floor((dataBytes * lit(1000L)).cast("double") /
          byteRate.cast("double")).cast("long")).as("duration_ms")))
  }

  /** Partition-wise "decode + feature extract". In production this is
    * where an image/audio codec runs once per batch with reused native
    * buffers; mapPartitions keeps that lifecycle explicit (one codec
    * instance per partition, streaming through rows).
    *
    * STUB: no codec libraries exist in this environment, so width/height/
    * n_frames are derived deterministically from the bytes; byte_len and
    * the checksum are computed from the real payload.
    */
  def decodeAndFeaturize(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // (real pipeline: codec := Codec.open() here, once per partition)
      it.map { m =>
        val bytes = m.payload
        val first = if (bytes.nonEmpty) bytes(0) & 0xff else 0
        var checksum = 0L
        var i = 0
        while (i < bytes.length) { // streaming checksum, no extra alloc
          checksum = (checksum * 131L + (bytes(i) & 0xffL)) % 2147483647L
          i += 1
        }
        MediaFeatures(
          media_id = m.media_id,
          byte_len = bytes.length.toLong,
          first_byte = first,
          width = 64 + (first % 64),            // STUB decode
          height = 64 + (bytes.length % 64).toInt, // STUB decode
          n_frames = 1 + (bytes.length % 8).toInt, // STUB decode
          byte_checksum = checksum)
      }
    }
  }
}
