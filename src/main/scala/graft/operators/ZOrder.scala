package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout — multi-dimensional clustering for data
  * skipping. A sort on (a, b) makes file-level min/max zone maps
  * razor-sharp on `a` and useless on `b`; interleaving the BITS of
  * both coordinates into one sort key gives every dimension locality
  * proportional to its bit share, so a zone-map prune on either
  * column skips most files (the `OPTIMIZE ZORDER BY` idea in
  * lakehouse engines, and the reason it exists). Composes with
  * [[graft.sources.ManifestCommit.writeVersionedWithStats]]: lay out
  * by z-value, commit with stats, and `readBetween` prunes on any
  * z-ordered dimension — the ZOrderSpec measures exactly that.
  *
  * Scale shape: the z-value is pure codegen'd integer arithmetic in
  * the scan stage; the layout is one range repartition on it (the
  * same shuffle a plain sorted write pays — z-ordering costs nothing
  * extra at write time).
  */
object ZOrder {

  /** Interleave the low `bits` bits of each coordinate into a Morton
    * code: result bit (b·k + i) is bit b of `cols(i)` for k
    * coordinates. Coordinates must already be normalized to
    * non-negative longs below 2^bits — bucketed ranks or fixed-width
    * range buckets (the caller knows its value distribution; Morton
    * codes only see bits). k·bits must fit a long's 63 value bits.
    * Out-of-range coordinates raise (a silently masked bit would
    * silently break locality).
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "at least one coordinate")
    require(bits >= 1 && cols.size * bits <= 63,
      s"${cols.size} coords x $bits bits must fit 63 bits")
    val k = cols.size
    val limit = 1L << bits
    val checked = cols.map(c =>
      when(c.isNotNull && c >= 0 && c < limit, c.cast("long"))
        .otherwise(raise_error(concat(
          lit(s"zValue coordinate out of [0, $limit): "),
          coalesce(c.cast("string"), lit("null")))).cast("long")))
    val terms = for {
      (c, i) <- checked.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * k + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Equal-width bucketing of `c` from [lo, hi] onto [0, 2^bits):
    * the normalization feeding [[zValue]] when the value range is
    * known. Values at `hi` land in the top bucket (inclusive upper
    * bound); values OUTSIDE [lo, hi] map to 2^bits so zValue's range
    * check fails them loudly — a clamp would silently co-locate
    * corrupt values with legitimate boundary rows, exactly the broken
    * locality the check exists to prevent.
    */
  def rangeBucket(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    require(lo < hi, s"need lo < hi: [$lo, $hi]")
    val n = 1L << bits
    // integral throughout (the RangeJoin.floorDiv lesson): width
    // rounds up so (hi - lo) / width < 2^bits always holds
    val width = ((hi - lo) + n - 1) / n max 1L
    when(c.between(lo, hi),
      least(RangeJoin.floorDiv(c - lit(lo), width), lit(n - 1)))
      .otherwise(lit(n))
  }

  /** Lay `df` out for z-locality: range-repartition into `nFiles`
    * partitions by the Morton code of `zCols` (each pre-normalized to
    * [0, 2^bits)), sorting within partitions — one file per partition
    * on write, so every file owns a compact z-range and its min/max
    * stats are tight on EVERY z-ordered dimension.
    */
  def layoutBy(
      df: DataFrame, zCols: Seq[String], bits: Int, nFiles: Int): DataFrame = {
    require(nFiles >= 1, s"nFiles must be >= 1: $nFiles")
    val clash = df.columns.contains("__z")
    require(!clash, "column __z clashes with layout internals")
    df.withColumn("__z", zValue(zCols.map(col), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
