package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.PolyHash.polyHash
import graft.operators.OrderedFold

/** Greedy sequence packing — assigning documents to fixed-capacity context
  * windows ("bins") for LLM training batches: walk documents in a
  * deterministic order, start a new bin whenever the next document would
  * overflow the running one, and emit each document's (bin, offset).
  *
  * Packing is an order-dependent recurrence (each assignment reads the
  * running fill level), so it rides [[OrderedFold.scanGroups]]: documents
  * hash into `nBuckets` independent packing groups (the parallelism unit —
  * bins never span buckets), each bucket is one shuffle partition's
  * streaming scan in doc-id order with O(1) state (current bin index +
  * fill). All arithmetic is integer, so the oracle replays the exact fold
  * with DuckDB `list_reduce`.
  */
object Packing {

  val OutputSchema: StructType = StructType(Seq(
    StructField("bucket", IntegerType, nullable = false),
    StructField("doc_id", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("bin_idx", IntegerType, nullable = false),
    StructField("bin_offset", LongType, nullable = false)))

  private final case class PackState(bin: Int, cur: Long)

  /** Pack by whitespace token counts: one output row per document with its
    * bucket, bin index within the bucket, and token offset within the bin.
    * Documents longer than `capacity` get a bin of their own (greedy
    * semantics: a bin only closes when the NEXT document would overflow).
    *
    * Sizing: `nBuckets` IS the parallelism — each bucket is one
    * sequential streaming scan on one core, so set buckets ≳ total
    * executor cores (a few × cores smooths stragglers). More buckets cost
    * nothing but slightly more bin fragmentation (one possibly-underfull
    * open bin per bucket); at 100 TB think thousands, not 8.
    */
  def greedyPack(df: DataFrame, idCol: String, textCol: String,
      capacity: Long, nBuckets: Int, salt: String): DataFrame = {
    require(capacity >= 1 && nBuckets >= 1)
    // fail fast on non-integral ids: cast("long") on e.g. a string id
    // yields null, which InternalRow.getLong would silently read as 0,
    // collapsing every doc onto doc_id=0 with broken pack order
    val idType = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"greedyPack needs an integral id column; '$idCol' is $idType " +
        "(hash string ids to long upfront, e.g. xxhash64)")
    val src = df.select(
      (polyHash(concat(col(idCol).cast("string"), lit(":" + salt))) % nBuckets)
        .cast("int").as("bucket"),
      col(idCol).cast("long").as("doc_id"),
      TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
    OrderedFold.scanGroups[PackState](
      src,
      keyCols = Seq("bucket"),
      orderCols = Seq(col("doc_id")),
      outSchema = OutputSchema)(
      init = () => PackState(0, 0L),
      step = (st, r) => {
        val bucket = r.getInt(0); val docId = r.getLong(1); val n = r.getLong(2)
        val (bin, off, cur) =
          if (st.cur + n > capacity && st.cur > 0) (st.bin + 1, 0L, n)
          else (st.bin, st.cur, st.cur + n)
        (PackState(bin, cur),
          new GenericInternalRow(Array[Any](bucket, docId, n, bin, off)))
      })
  }

  /** Packing-quality summary over [[greedyPack]] output — the metric a
    * training-batch engineer actually monitors: per-bin fill fraction
    * (capped at 1.0 for oversized single-doc bins) aggregated to one row.
    * Two cheap aggregations over ids-only columns; exact integer sums
    * with one final double division, so the oracle replays it.
    */
  def fillStats(packed: DataFrame, capacity: Long): DataFrame = {
    val bins = packed.groupBy(col("bucket"), col("bin_idx"))
      .agg(sum(col("n_tokens")).as("bin_tokens"),
        count(lit(1)).as("n_docs"))
    bins.agg(
      count(lit(1)).as("n_bins"),
      sum(col("n_docs")).as("n_docs"),
      sum(col("bin_tokens")).as("total_tokens"),
      (sum(least(col("bin_tokens"), lit(capacity))).cast("double") /
        (count(lit(1)) * capacity)).as("mean_fill"))
  }
}
