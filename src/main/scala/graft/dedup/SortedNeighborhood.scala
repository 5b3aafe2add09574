package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps

/** Sorted-neighborhood blocking (Hernández & Stolfo 1995) — the
  * entity-resolution candidate generator that trades the all-pairs
  * quadratic for one sort: order the corpus by a blocking key, slide a
  * window of size w, and only rank-adjacent records become candidate
  * pairs. The right tool when near-duplicates agree on a cheap sortable
  * surrogate (length, normalized title, zip+name prefix) — the sort
  * brings them together without any token join at all. Blocking is a
  * RECALL HEURISTIC by contract (a true pair further than w ranks apart
  * is missed); what is exact — and what the oracle replays — is the
  * window semantics itself plus the verify metric on each candidate.
  *
  * The global rank is never a single-partition window: ranks are
  * bucket-parallel (q104's two-phase prefix sum) — a tiny per-bucket
  * count table gets cumulative offsets, and each bucket computes
  * row_number locally; global rank = bucket offset + local rank. The
  * bucket column must be a coarse integer prefix of the intended order
  * (rows sort by bucket first, then `tieCols`, then id — ties broken
  * deterministically by id).
  *
  * Scale shape: one |buckets|-sized offset table (materialized,
  * broadcast back), one window sort per bucket (spill-safe, parallel
  * across buckets), a w-way probe explode of ids-only rows, and one
  * rank equi-join — no data-row cross product anywhere.
  */
object SortedNeighborhood {

  /** Candidate pairs within `w` ranks of each other under the order
    * (bucketCol, tieCols…, idCol). Output: (a, b, dist) where a is the
    * LOWER-ranked record's id, b the higher, dist ∈ [1, w] their rank
    * distance. Null bucket/tie/id values are dropped (they have no
    * place in a total order). */
  def candidatePairs(
      df: DataFrame,
      idCol: String,
      bucketCol: String,
      tieCols: Seq[String],
      w: Int): DataFrame = {
    require(w >= 1, s"window must be >= 1, got $w")
    val ranked = globalRank(df, idCol, bucketCol, tieCols)
    val probes = ranked
      .withColumn("__k", explode(sequence(lit(1), lit(w))))
      .select(col(idCol).as("a"), (col("__rank") + col("__k")).as("__target"),
        col("__k").as("dist"))
    probes.join(ranked.select(col(idCol).as("b"),
        col("__rank").as("__target")), "__target")
      .select(col("a"), col("b"), col("dist").cast("long").as("dist"))
  }

  /** The bucket-parallel global rank: (input columns…, __rank), rank
    * dense over the order (bucketCol, tieCols…, idCol), starting at 1.
    * Exposed for reuse (ordered exports, neighborhood joins). */
  def globalRank(
      df: DataFrame,
      idCol: String,
      bucketCol: String,
      tieCols: Seq[String]): DataFrame =
    globalRankCum(df, idCol, bucketCol, tieCols)

  /** The general bucket-parallel order-statistics pass behind
    * [[globalRank]]: rank over (partCols…, bucketCol, tieCols…, idCol)
    * restarting at 1 inside each `partCols` group (empty = one global
    * order), plus — when `cumCol` is set — the INCLUSIVE running sum
    * `__cum` of that column over the same order. This is the
    * scale-safe replacement for `row_number()/sum() over
    * (Window.orderBy(…))` on any dim that grows with the data
    * (customers, users, vocabulary, scored documents): the only
    * ordered-by-only windows here run over the per-bucket count table
    * (|partitions|·|buckets| rows, materialized then broadcast), and
    * every data row is ranked/cum-summed inside its own
    * (partition, bucket) window — parallel across buckets, spill-safe
    * within.
    *
    * `bucketCol` must be a coarse MONOTONE prefix of the intended
    * order inside each partition (e.g. `value div width`, or
    * `-floor(log2(c))` for a count-descending rank) — rows order by
    * (part, bucket, ties…, id). Null part/bucket/tie/id rows drop (no
    * place in a total order). Output: input columns + `__rank`
    * (+ `__cum`). */
  def globalRankCum(
      df: DataFrame,
      idCol: String,
      bucketCol: String,
      tieCols: Seq[String],
      partCols: Seq[String] = Nil,
      cumCol: Option[String] = None): DataFrame = {
    val out = globalRankCums(df, idCol, bucketCol, tieCols, partCols,
      cumCol.toSeq)
    cumCol.fold(out)(c => out.withColumnRenamed(s"__cum_$c", "__cum"))
  }

  /** [[globalRankCum]] generalized to ANY number of running-sum
    * columns sharing the one order — each `cumCols` entry yields an
    * inclusive `__cum_<col>`; still one per-bucket count table and one
    * in-bucket window pass total (an ECDF over two sample counts is
    * one call here, not two full passes). */
  def globalRankCums(
      df: DataFrame,
      idCol: String,
      bucketCol: String,
      tieCols: Seq[String],
      partCols: Seq[String] = Nil,
      cumCols: Seq[String] = Nil): DataFrame = {
    val keyCols = partCols :+ bucketCol
    val clean = df.where(
      (keyCols ++ tieCols :+ idCol).map(col(_).isNotNull).reduce(_ && _))
    val aggs = count(lit(1)).as("__bn") +:
      cumCols.map(c => sum(col(c)).as(s"__bs_$c"))
    val perBucket = clean.groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .materialize()
    val wOffBase =
      if (partCols.isEmpty) Window.orderBy(col(bucketCol))
      else Window.partitionBy(partCols.map(col): _*).orderBy(col(bucketCol))
    val wOff = wOffBase.rowsBetween(Window.unboundedPreceding, -1)
    val offsets0 = perBucket
      .withColumn("__offset", coalesce(sum(col("__bn")).over(wOff), lit(0L)))
    val offsets = cumCols.foldLeft(offsets0) { (acc, c) =>
      acc.withColumn(s"__cumoff_$c",
        coalesce(sum(col(s"__bs_$c")).over(wOff), lit(0)))
    }.select((keyCols.map(col) :+ col("__offset")) ++
      cumCols.map(c => col(s"__cumoff_$c")): _*)
    val wIn = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((tieCols.map(col) :+ col(idCol)).map(_.asc): _*)
    val ranked = clean.join(broadcast(offsets), keyCols)
      .withColumn("__rank", col("__offset") + row_number().over(wIn))
    cumCols.foldLeft(ranked) { (acc, c) =>
      acc.withColumn(s"__cum_$c", col(s"__cumoff_$c") + sum(col(c)).over(
        wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    }.drop("__offset" +: cumCols.map(c => s"__cumoff_$c"): _*)
  }
}
