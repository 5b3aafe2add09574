package graft.queries

import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-7 closing wave: feature cold-start coverage, the
  * concentration index (rank-Gini hybrid), the inspection paradox
  * quantified, TOST equivalence testing, and Mincer–Zarnowitz
  * forecast-rationality regression. Exact integers everywhere;
  * concentration ranks ride globalRankCum. */
object EquivalenceQueries {

  val all: Seq[Q] = Seq(q571, q572, q573, q574, q575)

  /** Cold-start coverage of the (brand × discount) feature grid: how
    * much of the eval half (1998+) lands in cells the train half never
    * saw — the serving-time coverage audit the q516-q520 model-eval
    * family presumes but never checks. Exact cell counts. */
  def q571: Q = Q(
    "q571_cold_start_coverage",
    Some("""
      |WITH l AS (
      |  SELECT p.p_brand AS br,
      |         CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT) AS dc,
      |         CASE WHEN year(l.l_shipdate) <= 1997 THEN 0 ELSE 1 END
      |           AS half
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
      |tr AS (SELECT DISTINCT br, dc FROM l WHERE half = 0),
      |ev AS (SELECT br, dc, count(*) AS n FROM l WHERE half = 1
      |       GROUP BY 1, 2),
      |jj AS (
      |  SELECT ev.br, ev.dc, ev.n,
      |         CASE WHEN tr.br IS NULL THEN 1 ELSE 0 END AS unseen
      |  FROM ev LEFT JOIN tr ON tr.br = ev.br AND tr.dc = ev.dc)
      |SELECT CAST(count(*) AS BIGINT) AS n_eval_cells,
      |       CAST(sum(unseen) AS BIGINT) AS n_unseen_cells,
      |       CAST(sum(n) AS BIGINT) AS n_eval_rows,
      |       CAST(sum(unseen * n) AS BIGINT) AS n_unseen_rows,
      |       CAST((1000000 * sum(unseen * n)) // sum(n) AS BIGINT)
      |         AS unseen_row_share_micro
      |FROM jj
      |""".stripMargin)) { (s, dir) =>
    val l = Tables.lineitem(s, dir)
      .join(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand").as("br")),
        col("l_partkey") === col("p_partkey"))
      .select(col("br"),
        expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)").as("dc"),
        when(year(col("l_shipdate")) <= 1997, 0).otherwise(1).as("half"))
      .materialize()
    val tr = l.where(col("half") === 0)
      .select(col("br").as("tbr"), col("dc").as("tdc")).distinct()
    val ev = l.where(col("half") === 1)
      .groupBy(col("br"), col("dc")).agg(count(lit(1)).as("n"))
    ev.join(broadcast(tr),
        col("tbr") === col("br") && col("tdc") === col("dc"), "left")
      .select(col("n"),
        when(col("tbr").isNull, 1L).otherwise(0L).as("unseen"))
      .agg(count(lit(1)).as("n_eval_cells"),
        sum(col("unseen")).as("n_unseen_cells"),
        sum(col("n")).as("n_eval_rows"),
        sum(col("unseen") * col("n")).as("n_unseen_rows"))
      .select(col("n_eval_cells"), col("n_unseen_cells"),
        col("n_eval_rows"), col("n_unseen_rows"),
        expr("(1000000 * n_unseen_rows) div n_eval_rows")
          .as("unseen_row_share_micro"))
  }

  /** Concentration index of returned lines over the customer SPEND
    * ranking (the health-economics statistic: Gini's numerator with
    * ranks from one variable, mass from another): CI = 2Σrᵢyᵢ/(nΣy)
    * − (n+1)/n — positive means returns concentrate among big
    * spenders. Spend ranks are bucket-parallel (globalRankCum); all
    * integer until one final pinned division pair. */
  def q572: Q = Q(
    "q572_concentration_index",
    Some("""
      |WITH cu AS (
      |  SELECT o.o_custkey AS k,
      |         CAST(sum(CAST(o.o_totalprice * 100 AS HUGEINT))
      |              AS BIGINT) AS spend
      |  FROM orders o GROUP BY 1),
      |rt AS (
      |  SELECT o.o_custkey AS k,
      |         sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS y
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  GROUP BY 1),
      |v AS (
      |  SELECT cu.k, cu.spend, coalesce(rt.y, 0) AS y
      |  FROM cu LEFT JOIN rt ON rt.k = cu.k),
      |rk AS (
      |  SELECT y, row_number() OVER (ORDER BY spend, k) AS r,
      |         count(*) OVER () AS n FROM v),
      |ag AS (SELECT max(n) AS n, sum(y) AS sy,
      |              sum(CAST(r AS HUGEINT) * y) AS sry FROM rk)
      |SELECT CAST(n AS BIGINT) AS n_customers,
      |       CAST(sy AS BIGINT) AS n_returned_lines,
      |       CAST(floor(CAST(
      |           2.0 * CAST(sry AS DOUBLE)
      |             / (CAST(n AS DOUBLE) * CAST(sy AS DOUBLE))
      |             - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE)
      |         AS DECIMAL(28,6)) * 1000) AS BIGINT)
      |         AS concentration_milli
      |FROM ag
      |""".stripMargin)) { (s, dir) =>
    val cu = Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("k"))
      .agg(expr("CAST(sum(CAST(o_totalprice * 100 AS DECIMAL(38,0)))" +
        " AS BIGINT)").as("spend"))
    val rt = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_returnflag")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("rk_"))
      .agg(sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
        .as("y"))
    val v = cu.join(rt, col("rk_") === col("k"), "left")
      .select(col("k"), col("spend"), coalesce(col("y"), lit(0L)).as("y"))
      .withColumn("__bkt", expr("spend div 4194304"))
      .materialize()
    val rk = graft.dedup.SortedNeighborhood.globalRankCum(
        v, idCol = "k", bucketCol = "__bkt", tieCols = Seq("spend"),
        partCols = Nil, cumCol = None)
    val n = v.agg(count(lit(1)).as("n"))
    rk.crossJoin(broadcast(n))
      .agg(max(col("n")).as("n"), sum(col("y")).as("sy"),
        sum(col("__rank").cast("decimal(38,0)") * col("y")).as("sry"))
      .select(col("n").as("n_customers"),
        col("sy").as("n_returned_lines"),
        expr("""CAST(floor(CAST(
            2.0 * CAST(sry AS DOUBLE)
              / (CAST(n AS DOUBLE) * CAST(sy AS DOUBLE))
              - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE)
          AS DECIMAL(28,6)) * 1000) AS BIGINT)""")
          .as("concentration_milli"))
  }

  /** The inspection paradox, quantified on event interarrivals: the
    * gap a random OBSERVER lands in averages E[X²]/E[X] — not
    * E[X] — so "time between events, as experienced" exceeds the
    * plain mean by exactly 1 + CV². Both sides exact integer moments;
    * the ratio is the length-bias factor a latency dashboard silently
    * suffers. */
  def q573: Q = Q(
    "q573_inspection_paradox",
    Some("""
      |WITH ev AS (
      |  SELECT epoch_ns(ts) AS tns, event_id FROM events),
      |gaps AS (
      |  SELECT tns - lag(tns) OVER (ORDER BY tns, event_id) AS g
      |  FROM ev),
      |mo AS (SELECT count(*) AS n, sum(g) AS sg,
      |              sum(CAST(g AS HUGEINT) * g) AS qg
      |       FROM gaps WHERE g IS NOT NULL)
      |SELECT CAST(n AS BIGINT) AS n_gaps,
      |       CAST(sg // n // 1000 AS BIGINT) AS mean_gap_us,
      |       CAST(qg // sg // 1000 AS BIGINT) AS observed_gap_us,
      |       CAST(floor(CAST(1000.0 * CAST(qg AS DOUBLE) * CAST(n AS DOUBLE) / (CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)) AS DECIMAL(28,6))) AS BIGINT) AS length_bias_milli
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    // bucket-parallel gap sequence: within-day gaps ride day-
    // partitioned windows; the day-boundary gaps come from a lag over
    // the bounded day dim (first-of-day minus previous day's last) —
    // no global row window over the event stream
    val ev = Tables.events(s, dir)
      .select(col("ts").as("tns"), col("event_id"),
        expr("ts div 86400000000000").as("day"))
      .materialize()
    val wIn = Window.partitionBy(col("day"))
      .orderBy(col("tns"), col("event_id"))
    val inner = ev
      .withColumn("g", col("tns") - lag(col("tns"), 1).over(wIn))
      .where(col("g").isNotNull)
      .select(col("g"))
    val wDay = Window.orderBy(col("day")) // day dim
    val bounds = ev.groupBy(col("day"))
      .agg(min(col("tns")).as("firstT"), max(col("tns")).as("lastT"))
      .withColumn("prevLast", lag(col("lastT"), 1).over(wDay))
      .where(col("prevLast").isNotNull)
      .select((col("firstT") - col("prevLast")).as("g"))
    val gaps = inner.unionAll(bounds)
    gaps.agg(count(lit(1)).as("n"), sum(col("g")).as("sg"),
        sum(col("g").cast("decimal(38,0)") * col("g")).as("qg"))
      .select(col("n").as("n_gaps"),
        expr("sg div n div 1000").as("mean_gap_us"),
        expr("CAST(qg div sg div 1000 AS BIGINT)").as("observed_gap_us"),
        expr("CAST(floor(CAST(1000.0 * CAST(qg AS DOUBLE) * CAST(n AS DOUBLE) / (CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)) AS DECIMAL(28,6))) AS BIGINT)").as("length_bias_milli"))
  }

  /** TOST equivalence test: are urgent and non-urgent return rates
    * EQUIVALENT within ±10‰ (two one-sided z-tests, both must clear
    * 1.645)? The inferential complement of the superiority tests
    * (q448): failing to reject difference is not equivalence — this
    * is. Exact counts; two pinned z statistics. */
  def q574: Q = {
    val se = "sqrt(CAST(p1 AS DOUBLE) / 1000.0" +
      " * (1.0 - CAST(p1 AS DOUBLE) / 1000.0) / CAST(n1 AS DOUBLE)" +
      " + CAST(p2 AS DOUBLE) / 1000.0" +
      " * (1.0 - CAST(p2 AS DOUBLE) / 1000.0) / CAST(n2 AS DOUBLE))"
    val diff = "(CAST(p1 AS DOUBLE) - CAST(p2 AS DOUBLE)) / 1000.0"
    val z1 = s"(($diff) + 0.010) / ($se)"   // H0: diff <= -margin
    val z2 = s"(0.010 - ($diff)) / ($se)"   // H0: diff >= +margin
    def qz(e: String, name: String) =
      s"CAST(floor(CAST($e AS DECIMAL(28,6)) * 1000) AS BIGINT) AS $name"
    Q("q574_tost_equivalence",
      Some(s"""
        |WITH l AS (
        |  SELECT CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0
        |         END AS t,
        |         CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |ag AS (
        |  SELECT sum(t) AS n1, sum(t * y) AS y1,
        |         sum(1 - t) AS n2, sum((1 - t) * y) AS y2
        |  FROM l),
        |pp AS (
        |  SELECT n1, n2, (1000 * y1) // n1 AS p1, (1000 * y2) // n2 AS p2
        |  FROM ag)
        |SELECT CAST(n1 AS BIGINT) AS n_urgent,
        |       CAST(p1 AS BIGINT) AS rate_urgent_milli,
        |       CAST(p2 AS BIGINT) AS rate_other_milli,
        |       ${qz(z1, "z_lower_milli")},
        |       ${qz(z2, "z_upper_milli")},
        |       CASE WHEN $z1 > 1.6448536269514722
        |             AND $z2 > 1.6448536269514722
        |            THEN 'equivalent_within_10pm' ELSE 'not_shown' END
        |         AS verdict
        |FROM pp
        |""".stripMargin)) { (s, dir) =>
      val ag = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .select(when(col("o_orderpriority") === "1-URGENT", 1L)
          .otherwise(0L).as("t"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
        .agg(sum(col("t")).as("n1"), sum(col("t") * col("y")).as("y1"),
          sum(lit(1L) - col("t")).as("n2"),
          sum((lit(1L) - col("t")) * col("y")).as("y2"))
      ag.select(col("n1"), col("n2"),
          expr("(1000 * y1) div n1").as("p1"),
          expr("(1000 * y2) div n2").as("p2"))
        .select(col("n1").as("n_urgent"),
          col("p1").as("rate_urgent_milli"),
          col("p2").as("rate_other_milli"),
          expr(qz(z1, "z_lower_milli")),
          expr(qz(z2, "z_upper_milli")),
          expr(s"CASE WHEN $z1 > 1.6448536269514722" +
            s" AND $z2 > 1.6448536269514722" +
            " THEN 'equivalent_within_10pm' ELSE 'not_shown' END")
            .as("verdict"))
    }
  }

  /** Mincer–Zarnowitz forecast-rationality regression: actual daily
    * revenue on the seasonal-naive forecast — an unbiased, efficient
    * forecaster has intercept 0 and slope 1; the joint drift is what
    * the MSE faces (q455/q538) can't localize. Exact moments; slope
    * and intercept as pinned doubles. */
  def q575: Q = {
    val slope = "CAST(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)" +
      " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS DOUBLE)" +
      " / CAST(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)" +
      " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS DOUBLE)"
    val icept = s"(CAST(sy AS DOUBLE) - ($slope) * CAST(sx AS DOUBLE))" +
      " / CAST(n AS DOUBLE)"
    def qz(e: String, name: String) =
      s"CAST(floor(CAST($e AS DECIMAL(28,6)) * 1000) AS BIGINT) AS $name"
    Q("q575_mincer_zarnowitz",
      Some(s"""
        |WITH ${Scaffolds.sqlDailyDollars},
        |lagged AS (
        |  SELECT x AS y, lag(x, 7) OVER (ORDER BY day) AS f
        |  FROM grid),
        |e AS (SELECT y, f FROM lagged WHERE f IS NOT NULL),
        |mo AS (
        |  SELECT count(*) AS n, sum(f) AS sx, sum(y) AS sy,
        |         sum(CAST(f AS HUGEINT) * y) AS sxy,
        |         sum(CAST(f AS HUGEINT) * f) AS sxx
        |  FROM e)
        |SELECT CAST(n AS BIGINT) AS n_days,
        |       ${qz(slope, "mz_slope_milli")},
        |       ${qz(icept, "mz_intercept_dollars_milli")}
        |FROM mo
        |""".stripMargin)) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val grid = Scaffolds.dailyDollars(s, dir)
      val w = Window.orderBy(col("day")) // calendar-bounded
      val e = grid.select(col("x").as("y"),
          lag(col("x"), 7).over(w).as("f"))
        .where(col("f").isNotNull)
      e.agg(count(lit(1)).as("n"), sum(col("f")).as("sx"),
          sum(col("y")).as("sy"),
          sum(col("f").cast("decimal(38,0)") * col("y")).as("sxy"),
          sum(col("f").cast("decimal(38,0)") * col("f")).as("sxx"))
        .select(col("n").as("n_days"),
          expr(qz(slope, "mz_slope_milli")),
          expr(qz(icept, "mz_intercept_dollars_milli")))
    }
  }
}
