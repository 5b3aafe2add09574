package graft.operators

import graft.Materialize.MatOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped second-moment statistics — Pearson correlation and ordinary
  * least-squares fit (slope/intercept) per group — computed the way
  * that is exact AND engine-portable: every accumulation is a sum of
  * INTEGERS in DECIMAL(38,0) (both engines sum decimals exactly, in
  * any order), and the handful of derived floating-point values are
  * each produced by ONE pinned sequence of IEEE ops over those exact
  * sums (cast-once, then divide/sqrt — correctly-rounded operations
  * that every IEEE-754 engine agrees on bit-for-bit). `corr`/`covar_pop`
  * built-ins accumulate doubles in partition order and are therefore
  * not reproducible across engines — or even across two runs with
  * different partitioning; this formulation is.
  *
  * Inputs must already be integral (quantize doubles to fixed-point
  * first, e.g. `floor(v * 100)` for cents — the repo-wide discipline).
  *
  * Scale shape: one scan, one partial-aggregated group-by exchange of
  * six decimal sums per group — the minimal shuffle for any grouped
  * statistic. No window, no second pass, no data-row shuffle.
  *
  * Overflow headroom: with |x|,|y| < 10^9 and n < 10^12 rows,
  * n·Σxy < 10^{12+9+9+12} = 10^42 exceeds DECIMAL(38); keep the
  * quantized magnitudes under ~10^7 for 100 TB-scale row counts
  * (n·Σxy ≲ 10^{12+7+7+12} = 10^38). The sums themselves (Σxy ≤ 10^26)
  * have ample room; it is the n·Σxy cross term that bounds the domain.
  */
object Stats {

  /** Per-group n, exact moment sums, and derived (corr, slope,
    * intercept) for y ≈ slope·x + intercept. `xCol`/`yCol` must be
    * integral-valued columns. Null x or y drops the row (pairwise
    * deletion, the SQL aggregate convention) — and so does a value the
    * DECIMAL(18,0) try_cast cannot represent (|v| ≥ 10^18 nulls under
    * either ANSI setting): the null filter runs on the CAST columns, so
    * n and the moment sums always see the same rows. (Filtering before
    * the cast would count a row whose sums skipped it — a silently
    * skewed fit.) Groups with zero x-variance yield null
    * slope/intercept/corr; zero y-variance yields corr null but a
    * valid (flat) fit.
    */
  def linearFit(
      df: DataFrame,
      keys: Seq[String],
      xCol: Column,
      yCol: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    // try_cast, not cast: under ANSI mode (Spark 4's default) a plain
    // cast of an unrepresentable value THROWS; the documented contract
    // is null-then-drop under either ANSI setting, with n counting
    // exactly the rows the sums saw.
    val base = df
      .select(keys.map(col) ++ Seq(
        xCol.as("__x0"), yCol.as("__y0")): _*)
      .withColumn("__x", expr("try_cast(__x0 AS decimal(18,0))"))
      .withColumn("__y", expr("try_cast(__y0 AS decimal(18,0))"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
    val sums = base.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(col("__x")).cast(d38).as("sx"),
      sum(col("__y")).cast(d38).as("sy"),
      sum((col("__x") * col("__y")).cast(d38)).cast(d38).as("sxy"),
      sum((col("__x") * col("__x")).cast(d38)).cast(d38).as("sxx"),
      sum((col("__y") * col("__y")).cast(d38)).cast(d38).as("syy"))
    // Exact integer determinants, then ONE cast each to double. The
    // subtraction happens in decimal (exact); only the final cast and
    // the divisions/sqrts below are floating — all correctly rounded,
    // so both engines produce the identical bit pattern.
    val nD = col("n").cast(d38)
    val num = (nD * col("sxy") - col("sx") * col("sy")).cast(d38)
    val dx = (nD * col("sxx") - col("sx") * col("sx")).cast(d38)
    val dy = (nD * col("syy") - col("sy") * col("sy")).cast(d38)
    val withDet = sums
      .withColumn("__num_d", num.cast("double"))
      .withColumn("__dx_d", dx.cast("double"))
      .withColumn("__dy_d", dy.cast("double"))
    val slope = when(col("__dx_d") > 0d, col("__num_d") / col("__dx_d"))
    val corr = when(col("__dx_d") > 0d && col("__dy_d") > 0d,
      col("__num_d") / (sqrt(col("__dx_d")) * sqrt(col("__dy_d"))))
    // intercept = (Σy − slope·Σx) / n, evaluated in double with the
    // same op order the oracle states: cast(sy), slope·cast(sx),
    // subtract, divide by cast(n).
    val intercept = when(col("__dx_d") > 0d,
      (col("sy").cast("double") - slope * col("sx").cast("double"))
        / col("n").cast("double"))
    withDet.select(keys.map(col) ++ Seq(
      col("n"), col("sx"), col("sy"), col("sxy"), col("sxx"), col("syy"),
      corr.as("corr"), slope.as("slope"), intercept.as("intercept")): _*)
  }

  /** Per-group Gini coefficient over a non-negative integral column —
    * the concentration metric a corpus data card reports ("is this
    * source a few huge documents or many small ones?"), also the
    * shard-balance check for size distributions. Uses the rank
    * identity G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over values sorted
    * ascending: numerator and denominator are EXACT DECIMAL(38,0)
    * integers (rank·value products summed decimally), and the single
    * division is the only floating op — bit-identical cross-engine.
    * Tied values make Σ i·xᵢ invariant to their internal order, so no
    * tie-break affects the result (one is still fixed, by id, for the
    * window's determinism).
    *
    * Scale shape: one per-group window sort (spill-safe, parallel
    * across groups) feeding one partial-aggregated exchange of three
    * decimal sums per group. Null values drop; groups with Σx = 0
    * yield null gini.
    *
    * Output: (keys…, n, sum_x, num, den, gini).
    */
  def gini(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      idCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(valueCol).asc, col(idCol).asc)
    val sums = df
      .where(col(valueCol).isNotNull)
      .withColumn("__i", row_number().over(w).cast(d38))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast(d38)).cast(d38).as("sum_x"),
        sum((col("__i") * col(valueCol).cast(d38)).cast(d38)).cast(d38)
          .as("__six"))
    val nD = col("n").cast(d38)
    val num = (lit(2).cast(d38) * col("__six") -
      (nD + lit(1).cast(d38)) * col("sum_x")).cast(d38)
    val den = (nD * col("sum_x")).cast(d38)
    sums
      .withColumn("num", num)
      .withColumn("den", den)
      .withColumn("gini",
        when(col("den") > 0,
          col("num").cast("double") / col("den").cast("double")))
      .drop("__six")
  }

  /** Per-group ranking AUC (Mann–Whitney U with average-rank ties) —
    * "does this score actually separate the positives?", the
    * model-free evaluation a curation pipeline runs on every quality /
    * relevance signal before trusting it for selection.
    *
    * Computed over per-score counts, never per-row ranks: aggregate to
    * (keys, score, n_pos, n_neg), prefix-sum negatives over the
    * DISTINCT-score table, and fold
    * 2U = Σ_s p_s·(2·negBelow_s + q_s) — the tied-pair term q_s
    * contributing the ½ credit without ever leaving integers. AUC is
    * then the ONE floating divide 2U / (2·n1·n0). Identical-score rows
    * collapse before the window, so the sort is over the score
    * vocabulary (bounded for any quantized signal), not the data — at
    * 100 TB the exchange carries (keys, score) partial counts and the
    * window runs on a dim-sized table.
    *
    * `scoreCol` must be integral-valued (quantize doubles first —
    * repo-wide discipline); `labelCol` must be a 0/1 integral column.
    * Rows with null score or label drop. Groups lacking both classes
    * yield null auc (n_pos, n_neg still reported).
    *
    * Output: (keys…, n_pos, n_neg, u2, auc), u2 = 2·U.
    */
  def rankAuc(
      df: DataFrame,
      keys: Seq[String],
      labelCol: Column,
      scoreCol: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val perScore = df
      .select(keys.map(col) ++ Seq(
        labelCol.cast("long").as("__y"), scoreCol.cast("long").as("__s")): _*)
      .where(col("__y").isNotNull && col("__s").isNotNull)
      .groupBy(keys.map(col) :+ col("__s"): _*)
      .agg(sum(col("__y")).as("__p"),
        (count(lit(1)) - sum(col("__y"))).as("__q"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__s").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val sums = perScore
      .withColumn("__nb", coalesce(sum(col("__q")).over(w), lit(0L)))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__p")).as("n_pos"),
        sum(col("__q")).as("n_neg"),
        sum((col("__p").cast(d38) *
          (lit(2).cast(d38) * col("__nb") + col("__q"))).cast(d38))
          .cast(d38).as("u2"))
    sums.withColumn("auc",
      when(col("n_pos") > 0 && col("n_neg") > 0,
        col("u2").cast("double") /
          (lit(2d) * col("n_pos").cast("double") * col("n_neg").cast("double"))))
  }

  /** Per-group chi-square goodness-of-fit against stated category
    * weights — the distribution test behind "are events uniform over
    * the hour of day?", "do these amounts follow Benford's law?",
    * "does this shard's category mix match the corpus?".
    *
    * Expected weights are integer ppm per category (the caller
    * quantizes irrational laws like Benford once, as literals — both
    * engines then test against the SAME stated law). With E_c =
    * n·e_c/10⁶, each term (o_c−E_c)²/E_c reduces to the integer-exact
    * rational (10⁶·o_c − n·e_c)² / (10⁶·n·e_c); the one double divide
    * per term is pinned, the term is quantized to DECIMAL(18,9), and
    * the statistic is the exact decimal sum of the quantized terms —
    * order-free (the q105/PSI discipline; a raw double Σ would depend
    * on category order).
    *
    * Zero-count categories still contribute ((0−E)²/E — omitting them
    * understates the statistic), via an expected-grid cross join.
    * Observations in categories NOT in the expected set are counted in
    * `n_unexpected` and EXCLUDED from the statistic — a nonzero value
    * means the stated law doesn't cover the data and the test is
    * unusable as-is; callers gate on it.
    *
    * Scale shape: one (keys, category) partial-aggregated exchange,
    * then every reduction runs on the category-dim-sized table; the
    * expected weights broadcast. Domain: n·10⁶ must stay within
    * DECIMAL(38) after squaring — n per group below ~10¹² rows.
    *
    * Output: (keys…, n, n_unexpected, chi2).
    */
  def chiSquareGof(
      df: DataFrame,
      keys: Seq[String],
      categoryCol: Column,
      expectedPpm: Seq[(String, Long)]): DataFrame = {
    require(expectedPpm.nonEmpty, "at least one expected category")
    require(expectedPpm.map(_._1).distinct.size == expectedPpm.size,
      "duplicate expected categories")
    require(expectedPpm.forall(_._2 > 0), "expected ppm must be positive")
    val d38 = "decimal(38,0)"
    val spark = df.sparkSession
    import spark.implicits._
    val exp = expectedPpm.toDF("__cat", "__eppm")
    val obs = df
      .select(keys.map(col) :+ categoryCol.cast("string").as("__cat"): _*)
      .where(col("__cat").isNotNull)
      .groupBy(keys.map(col) :+ col("__cat"): _*)
      .agg(count(lit(1)).as("__o"))
      .materialize() // category dim; feeds totals + the grid join
    val matched = obs.join(broadcast(exp), Seq("__cat"), "left")
    val tot = matched.groupBy(keys.map(col): _*)
      .agg(sum(when(col("__eppm").isNotNull, col("__o")).otherwise(0L))
          .as("n"),
        sum(when(col("__eppm").isNull, col("__o")).otherwise(0L))
          .as("n_unexpected"))
    val grid = tot.crossJoin(broadcast(exp))
      .join(obs.withColumnRenamed("__o", "__oc"), keys :+ "__cat", "left")
      .withColumn("__oc", coalesce(col("__oc"), lit(0L)))
    val num = (lit(1000000L).cast(d38) * col("__oc") -
      col("n").cast(d38) * col("__eppm")).cast(d38)
    val den = (lit(1000000L).cast(d38) * col("n") * col("__eppm")).cast(d38)
    grid
      .withColumn("__t",
        when(col("n") > 0,
          ((num * num).cast(d38).cast("double") / den.cast("double"))
            .cast(org.apache.spark.sql.types.DecimalType(18, 9)))
          .otherwise(lit(0).cast(org.apache.spark.sql.types.DecimalType(18, 9))))
      .groupBy(keys.map(col): _*)
      .agg(min(col("n")).as("n"),
        min(col("n_unexpected")).as("n_unexpected"),
        sum(col("__t")).cast("double").as("chi2"))
  }
}
