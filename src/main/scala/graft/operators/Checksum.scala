package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.PolyHash

/** Order-independent table checksums — the anti-entropy primitive for
  * answering "do these two copies of a dataset hold the same rows?"
  * without moving either copy: each side reduces to `nBuckets` rows of
  * (bucket, n_rows, checksum) and only those tiny summaries travel.
  * Replica verification after a migration, a backfill, or a
  * cross-engine port (the DuckDB oracle IS the other engine here)
  * compares summaries, then re-syncs only the buckets that differ —
  * a Merkle-style narrowing at whatever bucket granularity the
  * re-transfer unit should be.
  *
  * The checksum is a sum of row hashes in DECIMAL(38,0): addition
  * commutes, so partition order, file order, and shuffle
  * nondeterminism cannot move it, and decimal keeps it exact at any
  * scale (31-bit hashes times corpus-scale row counts never near 38
  * digits). A multiset property holds: duplicate rows contribute
  * twice — checksum equality is multiset equality up to hash
  * collisions (~2^-31 per differing bucket pair; bucket count
  * multiplies the error budget).
  *
  * Scale shape: one scan stage computing the codegen'd row hash, one
  * `nBuckets`-group aggregate with map-side partials. Nothing else.
  */
object Checksum {

  private val FieldSep = "\u0001"
  private val NullSentinel = "\u0000"

  /** Canonical row hash over `cols`, null-safe and
    * concatenation-unambiguous: each value casts to string, nulls
    * become a control-character sentinel no cast emits, fields join on
    * a second control character — so ("a", null) and ("a", "") differ
    * and shifted concatenations cannot collide. Cast-to-string is
    * engine-portable for integral, string, and boolean columns; float
    * columns must be quantized by the caller first (engines disagree
    * on double formatting — NOTES rule 4).
    */
  def rowHash(cols: Seq[Column], salt: String = "cksum"): Column =
    PolyHash.saltedHash(
      concat_ws(FieldSep, cols.map(c => coalesce(c.cast("string"),
        lit(NullSentinel))): _*), salt)

  /** Per-bucket (bucket, n_rows, checksum) summary of `df` over
    * `cols`: bucket = rowHash mod `nBuckets`, checksum = Σ rowHash as
    * DECIMAL(38,0). Buckets with no rows are absent (a diff against an
    * absent bucket reads as n_rows 0, checksum 0).
    */
  def bucketChecksums(
      df: DataFrame, cols: Seq[String], nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    require(cols.nonEmpty, "at least one column")
    df.select(rowHash(cols.map(col)).as("__h"))
      .groupBy(pmod(col("__h"), lit(nBuckets.toLong)).as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__h").cast(DecimalType(38, 0))).as("checksum"))
  }

  /** The buckets where two summaries disagree — the rows a re-sync
    * must fetch. Inputs are [[bucketChecksums]] outputs with the SAME
    * (cols, nBuckets); output: (bucket, n_rows_a, n_rows_b,
    * checksum_a, checksum_b), absent buckets zero-filled. Empty ⇔ the
    * two tables are multiset-equal (up to hash collision).
    */
  def diffBuckets(a: DataFrame, b: DataFrame): DataFrame = {
    val zero = lit(0L).cast(DecimalType(38, 0))
    val l = a.select(col("bucket"), col("n_rows").as("n_rows_a"),
      col("checksum").as("checksum_a"))
    val r = b.select(col("bucket"), col("n_rows").as("n_rows_b"),
      col("checksum").as("checksum_b"))
    l.join(r, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_rows_a"), lit(0L)).as("n_rows_a"),
        coalesce(col("n_rows_b"), lit(0L)).as("n_rows_b"),
        coalesce(col("checksum_a"), zero).as("checksum_a"),
        coalesce(col("checksum_b"), zero).as("checksum_b"))
      .where(col("n_rows_a") =!= col("n_rows_b") ||
        col("checksum_a") =!= col("checksum_b"))
  }
}
