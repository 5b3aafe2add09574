package graft.text
import graft.Materialize.MatOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distribution-drift scoring — Population Stability Index per stratum
  * against the whole population, over a fixed-boundary histogram. This
  * is the monitoring primitive a 100 TB ingest pipeline runs per
  * source/day: "has this feed's length/quality profile moved?" —
  * PSI = Σ_b (p_b − q_b)·ln(p_b/q_b), with the conventional reading
  * (< 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted).
  *
  * Same fixed-boundary trick as [[graft.operators.HistogramSketch]]:
  * because the boundaries are literals, the histogram is one exact
  * grouped count (associative, partition-independent), and everything
  * downstream operates on |strata| × |buckets| rows. Empty buckets are
  * floored at `eps` on BOTH sides of the ratio (the standard PSI
  * continuity correction — ln(0) is the alternative). ln's last ulp is
  * not cross-engine portable, so each bucket term is quantized to
  * DECIMAL(18,9) and the cross-bucket sum is exact — the q98/BM25
  * discipline for sums of transcendental outputs.
  */
object Drift {

  /** Per-stratum PSI of `valueCol`'s distribution vs the global one.
    * `boundaries` sorted ascending, starting at the minimum possible
    * value; a row below boundaries.head (or null) fails loudly, like
    * HistogramSketch — silent mis-bucketing would shift every term.
    * Output: (stratumCol, n_rows, psi) — psi is a double recovered
    * from the exact decimal sum.
    */
  def psi(
      df: DataFrame,
      valueCol: String,
      stratumCol: String,
      boundaries: Seq[Long],
      eps: Double = 1e-4): DataFrame =
    psiFromHistogram(histogram(df, valueCol, stratumCol, boundaries),
      boundaries.size, eps, stratumCol)

  /** The streamable half: the (stratum, bucket, cnt) fixed-boundary
    * histogram — a plain grouped count, so it is ALSO a valid
    * incremental streaming aggregate (run it on a readStream in
    * complete mode and feed each snapshot to [[psiFromHistogram]]:
    * drift monitoring that updates per micro-batch; spec-pinned equal
    * to the batch path). */
  def histogram(
      df: DataFrame,
      valueCol: String,
      stratumCol: String,
      boundaries: Seq[Long]): DataFrame = {
    require(boundaries.nonEmpty && boundaries == boundaries.sorted &&
      boundaries.distinct == boundaries, "boundaries must be sorted distinct")
    val v = col(valueCol)
    val chain = boundaries.map(b => when(v >= lit(b), 1).otherwise(0))
      .reduce(_ + _) - lit(1)
    val bucket = when(v >= lit(boundaries.head), chain)
      .otherwise(raise_error(concat(
        lit(s"Drift.psi: $valueCol below boundaries.head " +
          s"(${boundaries.head}) or null: "),
        coalesce(v.cast("string"), lit("null")))).cast("int"))
    df.select(col(stratumCol).as("__s"), bucket.as("__b"))
      .groupBy(col("__s"), col("__b"))
      .agg(count(lit(1)).as("__c"))
  }

  /** Two-sample PSI: distribution drift of `valueCol` BETWEEN two
    * datasets (e.g. two corpus generations / snapshots) per stratum —
    * the generation-gate a versioned ingest pipeline runs before
    * publishing: "did this source's profile move since the last good
    * snapshot?". Both sides histogram with the same literal
    * boundaries (each one exact grouped count), and the PSI fold is
    * the same eps-floored, product-quantized, scale-9-summed term as
    * [[psiFromHistogram]] — identical cross-engine discipline.
    * Output: (stratumCol, n_a, n_b, psi); a stratum absent from one
    * side contributes every bucket at the eps floor (maximal drift
    * signal, not a dropped row).
    */
  def psiBetween(
      a: DataFrame,
      b: DataFrame,
      valueCol: String,
      stratumCol: String,
      boundaries: Seq[Long],
      eps: Double = 1e-4): DataFrame = {
    val ha = histogram(a, valueCol, stratumCol, boundaries).materialize()
    val hb = histogram(b, valueCol, stratumCol, boundaries).materialize()
    val na = ha.groupBy(col("__s")).agg(sum(col("__c")).as("__na"))
    val nb = hb.groupBy(col("__s")).agg(sum(col("__c")).as("__nb"))
    val strata = na.join(nb, Seq("__s"), "full_outer")
    val grid = strata.crossJoin(
      broadcast(a.sparkSession.range(boundaries.size.toLong).select(
        col("id").cast("int").as("__b"))))
    def floored(c: Column, n: Column): Column =
      greatest(coalesce(c.cast("double") / n.cast("double"), lit(0.0)),
        lit(eps))
    val terms = grid
      .join(ha.withColumnRenamed("__c", "__ca"), Seq("__s", "__b"), "left")
      .join(hb.withColumnRenamed("__c", "__cb"), Seq("__s", "__b"), "left")
      .select(col("__s"), col("__na"), col("__nb"),
        floored(coalesce(col("__ca"), lit(0L)), col("__na")).as("__p"),
        floored(coalesce(col("__cb"), lit(0L)), col("__nb")).as("__q"))
      .withColumn("__term",
        (col("__p") - col("__q")) * log(col("__p") / col("__q")))
    terms
      .groupBy(col("__s").as(stratumCol),
        col("__na").as("n_a"), col("__nb").as("n_b"))
      .agg(sum(col("__term").cast(DecimalType(18, 9)))
        .cast("double").as("psi"))
  }

  /** PSI over a prebuilt [[histogram]] (sketch-sized input; everything
    * here is tiny). `nBuckets` = the boundary count the histogram was
    * built with. */
  def psiFromHistogram(
      hist: DataFrame,
      nBuckets: Int,
      eps: Double = 1e-4,
      stratumName: String = "stratum"): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be positive, got $nBuckets")
    require(eps > 0 && eps < 1, s"eps must be in (0,1), got $eps")
    // stage boundary: strata counts, global counts and the dense grid
    // all re-reference the histogram — materialize the sketch-sized
    // table once (this also gives every reference fresh attribute ids,
    // which a memory-sink view cannot provide for a self-join)
    val h = hist.materialize()
    val perStratum = h.groupBy(col("__s")).agg(sum(col("__c")).as("__n"))
    val global = h.groupBy(col("__b")).agg(sum(col("__c")).as("__gc"))
    val globalN = h.agg(sum(col("__c")).as("__gn"))
    // dense strata × buckets grid so empty buckets contribute their
    // eps-floored term instead of silently dropping out
    val grid = perStratum.crossJoin(
      broadcast(hist.sparkSession.range(nBuckets.toLong).select(
        col("id").cast("int").as("__b"))))
    def floored(c: Column, n: Column): Column =
      greatest(c.cast("double") / n.cast("double"), lit(eps))
    val terms = grid
      .join(h, Seq("__s", "__b"), "left")
      .join(broadcast(global), Seq("__b"), "left")
      .crossJoin(broadcast(globalN))
      .select(col("__s"), col("__n"),
        floored(coalesce(col("__c"), lit(0L)), col("__n")).as("__p"),
        floored(coalesce(col("__gc"), lit(0L)), col("__gn")).as("__q"))
      // each bucket term quantizes to DECIMAL(18,9) as ONE cast of the
      // double product, and the cross-bucket sum stays at scale 9: the
      // scale-9 sum's integer numerator is < 2^53, so the final
      // decimal→double conversion is exact in both engines. (Quantizing
      // the factors separately and multiplying in decimal pushes the
      // sum to scale 18, whose >2^53 numerator double-rounds in
      // DuckDB's int128→double path — an observed 1-ulp divergence.
      // Decimal RESCALING is no escape either: DuckDB truncates decimal
      // downcasts where Spark rounds HALF_UP.)
      .withColumn("__term",
        (col("__p") - col("__q")) * log(col("__p") / col("__q")))
    terms
      .groupBy(col("__s").as(stratumName), col("__n").as("n_rows"))
      .agg(sum(col("__term").cast(DecimalType(18, 9)))
        .cast("double").as("psi"))
  }
}
