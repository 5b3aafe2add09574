package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Compression-ratio quality signal — the cheap, language-agnostic
  * repetition detector production corpus filters actually use
  * (boilerplate, keyword stuffing, and template farms compress far
  * better than natural text): ratio = deflate(text).length / length.
  * Runs on the JVM's built-in zlib (java.util.zip.Deflater, level
  * pinned, no dictionary), one Deflater instance per PARTITION reused
  * across rows — the same native-resource lifecycle as the multimodal
  * decode pass, which is why this is a mapPartitions operator and not
  * a UDF-per-row (Deflater allocation is the dominant cost at scale).
  *
  * Determinism: a fixed zlib level on a fixed JVM is deterministic, so
  * the signal is stable within an environment and monotone-comparable
  * across documents; absolute byte counts are NOT a cross-engine
  * contract (DuckDB has no zlib), so this operator is spec-verified
  * and its query is rows-only at the driver — stated honestly instead
  * of pretending a hash oracle exists.
  */
object Compressibility {

  final case class CompressScore(
      doc_id: Long, n_bytes: Long, n_deflated: Long, ratio_permille: Long)

  /** Per-doc deflate ratio in permille (small = repetitive). Empty
    * docs get ratio 1000 (incompressible by convention — they carry no
    * repetition evidence). `level` is the zlib level (1-9). */
  def deflateRatio(
      df: DataFrame,
      idCol: String,
      textCol: String,
      level: Int = 6): Dataset[CompressScore] = {
    require(level >= 1 && level <= 9, s"zlib level must be in [1,9]: $level")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).cast("string").as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(level)
        val buf = new Array[Byte](64 * 1024)
        it.map { case (id, text) =>
          val bytes =
            if (text == null) Array.emptyByteArray
            else text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(bytes)
          deflater.finish()
          var out = 0L
          while (!deflater.finished()) out += deflater.deflate(buf)
          val ratio =
            if (bytes.isEmpty) 1000L else out * 1000L / bytes.length
          CompressScore(id, bytes.length.toLong, out, ratio)
        }
      }
  }
}
