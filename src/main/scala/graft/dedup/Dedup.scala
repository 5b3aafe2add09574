package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PolyHash.polyHash
import graft.text.TextAnalysis

/** Deduplication operators for training-data pipelines, designed for the
  * 100 TB regime:
  *
  *  - exact dedup: one shuffle on a 64-bit content fingerprint (never on
  *    the full text — at scale the key must be small);
  *  - MinHash + LSH near-dedup: per-doc signatures computed in the scan
  *    stage (pure column expressions, no UDF), then candidate generation by
  *    banding — shuffle cost O(docs × bands), never O(docs²);
  *  - SimHash: 32-bit signatures, same scan-stage pattern;
  *  - exact n-gram Jaccard verification on the (tiny) candidate set only.
  *
  * All hashing is the deterministic PolyHash/LCG family, so results are
  * partition-count-independent and replayable by the DuckDB oracle.
  */
object Dedup {

  /** Word n-gram shingles as strings ("w1 w2 w3"). */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextAnalysis.tokens(text)
    val count = size(toks) - (n - 1)
    transform(sequence(lit(1), greatest(count, lit(0))), i =>
      concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*))
  }

  /** 64-bit-safe hashes of each shingle (PolyHash over code points). */
  def shingleHashes(text: Column, n: Int = 3): Column =
    transform(shingles(text, n), s => polyHash(s))

  /** LCG-derived permutation parameters — reproducible everywhere,
    * including SQL: a_p = (1103515245·(p+1) + 12345) mod M (forced odd),
    * b_p = (1103515245·(p+101) + 12345) mod M. */
  val Mod: Long = 2147483647L
  def permA(p: Int): Long = ((1103515245L * (p + 1) + 12345L) % Mod) | 1L
  def permB(p: Int): Long = (1103515245L * (p + 101) + 12345L) % Mod

  /** MinHash signature: for each of `perms` permutations, the minimum of
    * (a_p·h + b_p) mod M over the doc's shingle hashes. Null-free docs with
    * zero shingles get M (= "empty" sentinel). Returns an array column of
    * length `perms`.
    */
  def minHashSignature(text: Column, perms: Int = 32, n: Int = 3): Column = {
    val hashes = shingleHashes(text, n)
    array((0 until perms).map { p =>
      coalesce(
        array_min(transform(hashes, h => (h * permA(p) + permB(p)) % Mod)),
        lit(Mod))
    }: _*)
  }

  /** Candidate near-duplicate pairs by LSH banding: signature split into
    * `bands` bands of `rowsPerBand`, band-bucket key = PolyHash of the
    * band's values; docs sharing any band bucket become a candidate pair.
    * One explode (docs × bands rows) + one shuffle on the bucket key; a
    * self-join inside buckets only.
    *
    * `df` must have columns (`idCol`, `textCol`).
    */
  def lshCandidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bands: Int = 16,
      rowsPerBand: Int = 2,
      n: Int = 3): DataFrame = {
    val perms = bands * rowsPerBand
    val withSig = df.select(
      col(idCol).as("doc_id"),
      minHashSignature(col(textCol), perms, n).as("sig"))
    val banded = withSig.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        concat_ws(",",
          (0 until rowsPerBand).map(r =>
            element_at(col("sig"), (b * rowsPerBand + r + 1).cast("int")).cast("string")) :+
            b.cast("string"): _*))))
      .select(col("doc_id"), col("pos").as("band"), polyHash(col("col")).as("bucket"))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") &&
        col("x.bucket") === col("y.bucket") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  /** Exact Jaccard similarity over distinct shingle sets — used to verify
    * LSH candidates. Integer-cardinality division: exact on both engines.
    */
  def jaccard(textA: Column, textB: Column, n: Int = 3): Column = {
    val a = array_distinct(shingles(textA, n))
    val b = array_distinct(shingles(textB, n))
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))
  }

  /** Near-duplicate pairs: LSH candidates filtered by exact Jaccard ≥
    * `threshold`. With 16 bands × 2 rows, a pair at J=0.8 is missed with
    * probability (1−0.8²)¹⁶ ≈ 1e-7.
    */
  def nearDuplicatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8): DataFrame = {
    val texts = df.select(col(idCol).as("id"), col(textCol).as("text"))
    lshCandidatePairs(df, idCol, textCol)
      .join(texts.select(col("id").as("doc_a"), col("text").as("text_a")), "doc_a")
      .join(texts.select(col("id").as("doc_b"), col("text").as("text_b")), "doc_b")
      .withColumn("jaccard", jaccard(col("text_a"), col("text_b")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Exact dedup: keep the lowest id per content fingerprint. Shuffles the
    * 64-bit fingerprint + id only.
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), polyHash(trim(col(textCol))).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** SimHash signature (32-bit): per token-hash bit b, votes +1/−1; bit set
    * iff the vote sum is > 0. Multiset over tokens, order-independent.
    */
  def simHash(text: Column, bits: Int = 32): Column = {
    val hashes = transform(TextAnalysis.tokens(text), t => polyHash(t))
    val bitCols = (0 until bits).map { b =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, b) % 2 === 1, 1L).otherwise(-1L))
      when(votes > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }
}
