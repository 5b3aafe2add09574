package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group order statistics — `percentile_disc` semantics: the
  * quantile is an ACTUAL data value (the rank-⌈p·n⌉ element ascending),
  * never an interpolation. That is the right contract for latencies,
  * sizes, and anything where "a value that occurred" matters, and it
  * is engine-portable by construction: selecting an element cannot
  * disagree in the last ulp the way interpolated percentile math does
  * (NOTES rule 4 — this is the order-stat sibling of the
  * HistogramSketch's reasoning).
  *
  * Quantiles are permille integers, so the target rank
  * `⌈permille·n/1000⌉` is exact integer arithmetic end to end.
  *
  * Scale shape: one exchange (hash by key), one window pass
  * (row_number + count over the same partitioning), one filter — the
  * group's values spill through the window sorter if they must, and
  * nothing ever collects.
  */
object OrderStats {

  /** For each key and each `permille` in `ps`: (keys…, permille,
    * value) with value = the rank-⌈p·n/1000⌉ element of `valueCol`
    * ascending (nulls excluded; groups of only-null values emit
    * nothing). Ties in `valueCol` are benign — equal values yield the
    * same selected value whatever their internal order. */
  def quantilesDisc(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      ps: Seq[Int]): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 1000),
      s"permilles must be in [1, 1000]: $ps")
    require(ps.distinct.size == ps.size, s"duplicate permilles: $ps")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(valueCol))
    val wn = Window.partitionBy(keys.map(col): _*)
    val ranked = df
      .where(col(valueCol).isNotNull)
      .select((keys.map(col) :+ col(valueCol)): _*)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wn))
    // target rank per permille: ceil(p*n/1000) = (p*n + 999) div 1000,
    // all integral; one output row per (group, permille)
    val hits = ps.map { p =>
      when(col("__rn") ===
        RangeJoin.floorDiv(lit(p.toLong) * col("__n") + 999L, 1000L),
        lit(p)).otherwise(lit(null))
    }
    ranked
      .withColumn("permille", explode(array(hits: _*)))
      .where(col("permille").isNotNull)
      .select((keys.map(col) :+ col("permille") :+
        col(valueCol).as("value")): _*)
  }

  /** Weighted discrete quantiles: for each key and `permille` p in
    * `ps`, the smallest value whose cumulative weight reaches the
    * target ⌈p·W/1000⌉ (W = the group's total weight) — the
    * quantity-weighted sibling of `quantilesDisc` (unit weights
    * degrade to it exactly). Equal values are merged (weights summed)
    * BEFORE the cumulative walk, so the scan runs over the group's
    * unique-VALUE dim — bounded by value cardinality, not row count —
    * and a tie can never straddle a target. Weights must be
    * non-negative integers; zero-weight values add nothing to any
    * cumulative step and so are never selected; null values/weights
    * drop.
    *
    * Scale shape: one hash aggregate (key, value), one window pass
    * over the value dim, one filter. The newsvendor/weighted-median
    * faces (q392/q394) ride this. */
  def weightedQuantilesDisc(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      weightCol: String,
      ps: Seq[Int]): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 1000),
      s"permilles must be in [1, 1000]: $ps")
    require(ps.distinct.size == ps.size, s"duplicate permilles: $ps")
    // enforce the documented contract at run time: a NEGATIVE weight
    // makes the cumulative ranges non-monotone, so a permille target
    // could silently match zero or multiple rows per group — fail
    // loudly per offending row instead of producing wrong quantiles
    val guarded = when(col(weightCol) < 0,
      raise_error(concat(
        lit(s"weightedQuantilesDisc: negative weight in '$weightCol': "),
        col(weightCol).cast("string"))))
      .otherwise(col(weightCol))
    val merged = df
      .where(col(valueCol).isNotNull && col(weightCol).isNotNull)
      .groupBy((keys.map(col) :+ col(valueCol)): _*)
      .agg(sum(guarded).as("__w"))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(valueCol))
    val wn = Window.partitionBy(keys.map(col): _*)
    val ranked = merged
      .withColumn("__cw", sum(col("__w")).over(w))
      .withColumn("__tw", sum(col("__w")).over(wn))
    // the row owning target t is the one whose cumulative range
    // (cw−w, cw] covers it — exact integer interval membership
    val hits = ps.map { p =>
      val target =
        RangeJoin.floorDiv(lit(p.toLong) * col("__tw") + 999L, 1000L)
      when(col("__cw") - col("__w") < target && target <= col("__cw"),
        lit(p)).otherwise(lit(null))
    }
    ranked
      .withColumn("permille", explode(array(hits: _*)))
      .where(col("permille").isNotNull)
      .select((keys.map(col) :+ col("permille") :+
        col(valueCol).as("value")): _*)
  }

  /** Rank normalization to integer permille — the monotone feature
    * transform (percent_rank scaled to [0, 1000]) that makes heavy-
    * tailed columns comparable across groups without touching floats:
    * permille = (rank−1)·1000 div (n−1), with rank() semantics (ties
    * share the rank of their first member, so equal values ALWAYS map
    * to equal permilles — row_number would split them by an arbitrary
    * tiebreak, which is wrong for a feature). Single-member groups map
    * to 0.
    *
    * Scale shape: one hash exchange per group + one window pass
    * (rank + count share the partitioning), no joins. Output: input
    * columns + `permille`. Null values drop. */
  def rankNormalize(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(valueCol))
    val wn = Window.partitionBy(keys.map(col): _*)
    df.where(col(valueCol).isNotNull)
      .withColumn("__rk", rank().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wn))
      .withColumn("permille",
        when(col("__n") > 1,
          expr("((__rk - 1) * 1000) div (__n - 1)")).otherwise(lit(0L)))
      .drop("__rk", "__n")
  }

  /** Equal-frequency binning: assign each row the bin index
    * `#{boundaries < value}` where the boundaries are the exact
    * [[quantilesDisc]] values at `ps` — quartile/decile feature
    * discretization with the same no-interpolation portability
    * contract (a row equal to a boundary falls in the LOWER bin; tied
    * boundaries collapse their bins, deterministically). Output: input
    * columns + `bin` ∈ [0, |ps|].
    *
    * Scale shape: the boundary table is |groups|·|ps| rows, collected
    * per group into one array column and broadcast back — the data
    * rows never shuffle; the bin is scan-stage array arithmetic. */
  def equalFrequencyBins(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      ps: Seq[Int]): DataFrame = {
    val bounds = quantilesDisc(df, keys, valueCol, ps)
      .groupBy(keys.map(col): _*)
      .agg(collect_list(col("value")).as("__bs"))
      .select(keys.map(c => col(c).as(s"__k_$c")) :+ col("__bs"): _*)
    val cond = keys.map(c => col(c) <=> col(s"__k_$c")).reduce(_ && _)
    df.join(broadcast(bounds), cond)
      .withColumn("bin",
        expr(s"size(filter(__bs, b -> $valueCol > b))").cast("long"))
      .drop((keys.map(c => s"__k_$c") :+ "__bs"): _*)
  }

  /** Quantile normalization — replace each value with the GLOBAL
    * order statistic at its within-group percent rank, so every
    * group's distribution maps onto the corpus distribution (the
    * cross-source feature alignment trick: "length 400 from src3" and
    * "length 90 from src7" both become "the corpus p62 length"). All
    * rank arithmetic is integer ([[rankNormalize]]'s permille +
    * [[quantilesDisc]]'s ⌈p·N/1000⌉ selection), and the normalized
    * value is an actual datum — nothing interpolates, so the result is
    * engine-exact.
    *
    * Scale shape: one group exchange (per-group permille), one
    * bucket-parallel global rank (value-bucketed — never a
    * single-partition window), then the ≤1001-row permille→value dim
    * broadcasts back onto the rows. Null value/id rows drop.
    *
    * Output: input columns + (permille, normalized).
    */
  def quantileNormalize(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      idCol: String): DataFrame = {
    val clean = df.where(col(valueCol).isNotNull && col(idCol).isNotNull)
    val withP = rankNormalize(clean, keys, valueCol)
    val ranked = graft.dedup.SortedNeighborhood
      .globalRank(clean.select(col(idCol), col(valueCol)),
        idCol, valueCol, Seq())
    val nTot = ranked.agg(max(col("__rank")).as("__N"))
    val spark = df.sparkSession
    val targets = spark.range(0, 1001)
      .select(col("id").as("permille"))
      .crossJoin(broadcast(nTot))
      .withColumn("__rank",
        greatest(lit(1L), expr("(permille * __N + 999) div 1000")))
      .select(col("permille"), col("__rank"))
    val qvals = ranked
      .join(broadcast(targets), Seq("__rank"))
      .select(col("permille"), col(valueCol).as("normalized"))
    withP.join(broadcast(qvals), Seq("permille"))
  }

  /** Winsorized per-group stats — the robust mean a data card reports
    * when a handful of outliers would otherwise own the average: clip
    * every value into the exact [p_lo, p_hi] ORDER-STATISTIC bounds
    * (actual data values via [[quantilesDisc]], so the clip points are
    * engine-portable by construction), then aggregate the clipped
    * column with an exact decimal sum and ONE pinned divide for the
    * mean. Reports how many rows each side clipped — the "how much did
    * robustness cost" number that decides whether the raw mean was
    * trustworthy.
    *
    * `valueCol` must be integral (the repo-wide quantize-first rule).
    * Scale shape: the quantile pass is one exchange + window; the
    * bounds table is group-sized and broadcasts back onto a second
    * scan whose aggregate is map-side partial — data rows never
    * shuffle for the clip.
    *
    * Output: (keys…, n, lo, hi, n_clipped_lo, n_clipped_hi,
    * winsor_mean).
    */
  def winsorizedStats(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      loPermille: Int,
      hiPermille: Int): DataFrame = {
    require(loPermille < hiPermille,
      s"lo must be < hi: $loPermille >= $hiPermille")
    val d38 = "decimal(38,0)"
    val qs = quantilesDisc(df, keys, valueCol, Seq(loPermille, hiPermille))
    val bounds = qs
      .groupBy(keys.map(col): _*)
      .agg(min(when(col("permille") === loPermille, col("value"))).as("lo"),
        min(when(col("permille") === hiPermille, col("value"))).as("hi"))
      .select(keys.map(c => col(c).as(s"__k_$c")) :+ col("lo") :+ col("hi"): _*)
    val cond = keys.map(c => col(c) <=> col(s"__k_$c")).reduce(_ && _)
    df.where(col(valueCol).isNotNull)
      .join(broadcast(bounds), cond)
      .withColumn("__c",
        least(greatest(col(valueCol), col("lo")), col("hi")))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        min(col("lo")).as("lo"),
        min(col("hi")).as("hi"),
        sum(when(col(valueCol) < col("lo"), 1L).otherwise(0L))
          .as("n_clipped_lo"),
        sum(when(col(valueCol) > col("hi"), 1L).otherwise(0L))
          .as("n_clipped_hi"),
        sum(col("__c").cast(d38)).cast(d38).as("__sum"))
      .withColumn("winsor_mean",
        col("__sum").cast("double") / col("n").cast("double"))
      .drop("__sum")
  }
}
