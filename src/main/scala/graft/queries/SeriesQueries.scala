package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Materialize.MatOps
import graft.Tables

/** Round-7 graph + time-series wave: co-purchase triangle census,
  * Theil-Sen robust trend, consecutive-day streak islands, the
  * Wald-Wolfowitz runs test, and the day-of-week × hour load heatmap —
  * the "shape of the series/graph" analytics a training-data pipeline
  * runs before trusting aggregate stats. All exact-integer (cents /
  * ppm / micro-quantized scalars) end to end.
  */
object SeriesQueries {

  val all: Seq[Q] = Seq(q326, q327, q328, q329, q330)

  /** Co-purchase triangle census: parts are nodes, "co-ordered in ≥2
    * distinct orders" the edges (the A-priori support prune keeps the
    * pair fan-out order-bounded, q169's discipline), then the global
    * triangle/wedge counts and clustering coefficient. The edge dim is
    * support-pruned (3.4k rows at sf0.01) so the 3-way triangle join
    * broadcasts; nothing fact-sized survives the first aggregate. */
  def q326: Q = Q(
    "q326_copurchase_triangles",
    Some("""
      |WITH pi AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM pi a JOIN pi b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |deg AS (
      |  SELECT node, count(*) AS d
      |  FROM (SELECT pa AS node FROM e UNION ALL SELECT pb FROM e)
      |  GROUP BY 1),
      |w AS (
      |  SELECT count(*) AS n_nodes, sum((d * (d - 1)) // 2) AS wedges
      |  FROM deg),
      |t AS (
      |  SELECT count(*) AS tri
      |  FROM e e1 JOIN e e2 ON e1.pb = e2.pa
      |       JOIN e e3 ON e1.pa = e3.pa AND e2.pb = e3.pb)
      |SELECT CAST(w.n_nodes AS BIGINT) AS n_nodes,
      |       CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
      |       CAST(w.wedges AS BIGINT) AS wedges,
      |       CAST(t.tri AS BIGINT) AS n_triangles,
      |       CAST(CASE WHEN w.wedges = 0 THEN 0
      |            ELSE (3000 * t.tri) // w.wedges END AS BIGINT)
      |         AS clustering_milli
      |FROM w CROSS JOIN t
      |""".stripMargin)) { (s, dir) =>
    val pi = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val e = pi
      .join(pi.select(col("l_orderkey").as("__rk"),
          col("l_partkey").as("pb")),
        col("l_orderkey") === col("__rk") && col("l_partkey") < col("pb"))
      .groupBy(col("l_partkey").as("pa"), col("pb"))
      .agg(count(lit(1)).as("__sup"))
      .where(col("__sup") >= 2)
      .select(col("pa"), col("pb"))
      .materialize() // edge dim feeds degree, count, and 3 triangle legs
    val deg = e.select(col("pa").as("node"))
      .unionAll(e.select(col("pb").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    val w = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("(d * (d - 1)) div 2")).as("wedges"))
    val ne = e.agg(count(lit(1)).as("n_edges"))
    val tri = e.select(col("pa").as("a1"), col("pb").as("b1"))
      .join(broadcast(e.select(col("pa").as("a2"), col("pb").as("b2"))),
        col("b1") === col("a2"))
      .join(broadcast(e.select(col("pa").as("a3"), col("pb").as("b3"))),
        col("a1") === col("a3") && col("b2") === col("b3"))
      .agg(count(lit(1)).as("tri"))
    w.crossJoin(broadcast(ne)).crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("wedges"),
        col("tri").as("n_triangles"),
        expr("CAST(CASE WHEN wedges = 0 THEN 0 " +
          "ELSE (3000 * tri) div wedges END AS BIGINT)")
          .as("clustering_milli"))
  }

  /** Theil-Sen robust trend of year-2000 daily revenue: the slope
    * quartiles over ALL day pairs (median = the Theil-Sen estimator,
    * p250/p750 its spread). Pairs are a day-dim cross (366² / 2 — a
    * bounded dim square, never fact-sized); each slope is one pinned
    * IEEE divide then floor-micro. */
  def q327: Q = Q(
    "q327_theil_sen_slope",
    Some("""
      |WITH dr AS (
      |  SELECT epoch_us(l_shipdate) // 86400000000 AS d,
      |         sum(CAST(l_extendedprice * 100 AS HUGEINT)) AS r
      |  FROM lineitem WHERE year(l_shipdate) = 2000 GROUP BY 1),
      |p AS (
      |  SELECT CAST(floor((1000000.0 * CAST(b.r - a.r AS DOUBLE))
      |                    / CAST(nullif(b.d - a.d, 0) AS DOUBLE))
      |              AS BIGINT) AS s
      |  FROM dr a JOIN dr b ON a.d < b.d),
      |r AS (
      |  SELECT s, row_number() OVER (ORDER BY s) AS rn,
      |         count(*) OVER () AS n
      |  FROM p)
      |SELECT 'slope_micro' AS stat, CAST(pm.p AS INTEGER) AS permille,
      |       r.s AS value
      |FROM r JOIN (VALUES (250), (500), (750)) pm(p)
      |  ON r.rn = (pm.p * r.n + 999) // 1000
      |ORDER BY permille
      |""".stripMargin)) { (s, dir) =>
    val dr = Tables.lineitem(s, dir)
      .where(year(col("l_shipdate")) === 2000)
      .groupBy(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) " +
        "div 86400000000").as("d"))
      .agg(sum((col("l_extendedprice") * 100).cast("decimal(38,0)"))
        .cast("long").as("r"))
    val drm = dr.materialize() // day dim used as both pair legs
    val pairs = drm.select(col("d").as("d1"), col("r").as("r1"))
      .join(drm.select(col("d").as("d2"), col("r").as("r2")),
        col("d1") < col("d2"))
      // nullif keeps the expression total: the null-filter conjunct can
      // be evaluated BEFORE d1<d2 once pushed into the join condition,
      // and ANSI double division by zero throws
      .select(expr("CAST(floor((1000000.0 * CAST(r2 - r1 AS DOUBLE)) " +
        "/ CAST(nullif(d2 - d1, 0) AS DOUBLE)) AS BIGINT)").as("s"),
        lit("slope_micro").as("stat"))
    graft.operators.OrderStats
      .quantilesDisc(pairs, Seq("stat"), "s", Seq(250, 500, 750))
      .orderBy(col("permille"))
  }

  /** Longest consecutive-day purchase streak per user, as a histogram
    * (streak length → users whose MAX streak is that long) — the
    * habit-formation curve. Classic gaps-and-islands: day −
    * row_number() is constant exactly on consecutive runs; every
    * window is user-partitioned. */
  def q328: Q = Q(
    "q328_purchase_streaks",
    Some("""
      |WITH a AS (
      |  SELECT DISTINCT user_id,
      |         epoch_ns(ts) // 86400000000000 AS d
      |  FROM events WHERE event_type = 'purchase'),
      |g AS (
      |  SELECT user_id,
      |         d - row_number() OVER (PARTITION BY user_id ORDER BY d)
      |           AS grp
      |  FROM a),
      |st AS (SELECT user_id, count(*) AS len FROM g GROUP BY user_id, grp),
      |m AS (SELECT user_id, max(len) AS ml FROM st GROUP BY 1)
      |SELECT CAST(ml AS BIGINT) AS streak_days,
      |       CAST(count(*) AS BIGINT) AS n_users
      |FROM m GROUP BY 1 ORDER BY 1
      |""".stripMargin)) { (s, dir) =>
    val a = Tables.events(s, dir)
      .where(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts div 86400000000000").as("d"))
      .distinct()
    a.withColumn("grp", col("d") - row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("d"))))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id")).agg(max(col("len")).as("ml"))
      .groupBy(col("ml").as("streak_days"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("streak_days"))
  }

  /** Wald-Wolfowitz runs test on year-2000 daily revenue deltas: are
    * up/down days random, or does demand trend? Counts are exact
    * integers; the z statistic is ONE shared double expression
    * (identical op order both engines) floor-micro-quantized. The only
    * ordered window runs over the ≤366-row day dim. */
  def q329: Q = {
    // same text both engines: doubles from integer counts, pinned order
    val zExpr =
      "CAST(floor(CAST((CAST(n_runs AS DOUBLE) - (1.0 + " +
        "(2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)) " +
        "/ CAST(n_signs AS DOUBLE))) / sqrt(" +
        "(2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE) " +
        "* (2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE) " +
        "- CAST(n_signs AS DOUBLE))) / (CAST(n_signs AS DOUBLE) " +
        "* CAST(n_signs AS DOUBLE) * (CAST(n_signs AS DOUBLE) - 1.0))" +
        ") AS DECIMAL(18,9)) * 1000000) AS BIGINT)"
    Q("q329_revenue_runs_test",
      Some(s"""
        |WITH dr AS (
        |  SELECT epoch_us(l_shipdate) // 86400000000 AS d,
        |         sum(CAST(l_extendedprice * 100 AS HUGEINT)) AS r
        |  FROM lineitem WHERE year(l_shipdate) = 2000 GROUP BY 1),
        |o AS (SELECT d, r, lag(r) OVER (ORDER BY d) AS pr FROM dr),
        |sg AS (
        |  SELECT d, CASE WHEN r > pr THEN 1 ELSE -1 END AS s
        |  FROM o WHERE pr IS NOT NULL AND r <> pr),
        |ch AS (SELECT d, s, lag(s) OVER (ORDER BY d) AS ps FROM sg),
        |c AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_signs,
        |         CAST(count(*) FILTER (s = 1) AS BIGINT) AS n_up,
        |         CAST(count(*) FILTER (s = -1) AS BIGINT) AS n_down,
        |         CAST(1 + count(*) FILTER (ps IS NOT NULL AND s <> ps)
        |              AS BIGINT) AS n_runs
        |  FROM ch)
        |SELECT n_signs, n_up, n_down, n_runs, $zExpr AS z_micro FROM c
        |""".stripMargin)) { (s, dir) =>
      val dr = Tables.lineitem(s, dir)
        .where(year(col("l_shipdate")) === 2000)
        .groupBy(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) " +
          "div 86400000000").as("d"))
        .agg(sum((col("l_extendedprice") * 100).cast("decimal(38,0)"))
          .cast("long").as("r"))
      val w = Window.orderBy(col("d")) // ≤366-row day dim
      dr.withColumn("pr", lag(col("r"), 1).over(w))
        .where(col("pr").isNotNull && col("r") =!= col("pr"))
        .select(col("d"),
          when(col("r") > col("pr"), lit(1)).otherwise(lit(-1)).as("s"))
        .withColumn("ps", lag(col("s"), 1).over(w))
        .agg(count(lit(1)).cast("long").as("n_signs"),
          count(when(col("s") === 1, 1)).cast("long").as("n_up"),
          count(when(col("s") === -1, 1)).cast("long").as("n_down"),
          (lit(1) + count(when(col("ps").isNotNull &&
            col("s") =!= col("ps"), 1))).cast("long").as("n_runs"))
        .select(col("n_signs"), col("n_up"), col("n_down"), col("n_runs"),
          expr(zExpr).as("z_micro"))
    }
  }

  /** Day-of-week × hour load heatmap with within-day shares and the
    * peak-hour flag — the capacity-planning face. Epoch-day dow
    * ((d+4) mod 7: 1970-01-01 was a Thursday) keeps both engines in
    * pure integer arithmetic; the peak is a per-dow top-1 window over
    * the ≤24-row hour dim. */
  def q330: Q = Q(
    "q330_dow_hour_heatmap",
    Some("""
      |WITH c AS (
      |  SELECT (epoch_ns(ts) // 86400000000000 + 4) % 7 AS dow,
      |         (epoch_ns(ts) % 86400000000000) // 3600000000000 AS hr,
      |         count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |t AS (SELECT dow, sum(n) AS tot FROM c GROUP BY 1),
      |r AS (
      |  SELECT c.dow, c.hr, c.n, (1000000 * c.n) // t.tot AS ppm,
      |         row_number() OVER (PARTITION BY c.dow
      |           ORDER BY c.n DESC, c.hr) AS rn
      |  FROM c JOIN t USING (dow))
      |SELECT CAST(dow AS BIGINT) AS dow, CAST(hr AS BIGINT) AS hr,
      |       CAST(n AS BIGINT) AS n_events,
      |       CAST(ppm AS BIGINT) AS share_ppm,
      |       CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_peak
      |FROM r ORDER BY dow, hr
      |""".stripMargin)) { (s, dir) =>
    val c = Tables.events(s, dir)
      .groupBy(expr("(ts div 86400000000000 + 4) % 7").as("dow"),
        expr("(ts % 86400000000000) div 3600000000000").as("hr"))
      .agg(count(lit(1)).as("n"))
      .materialize() // dow×hour dim feeds totals AND the rank pass
    val t = c.groupBy(col("dow")).agg(sum(col("n")).as("tot"))
    c.join(broadcast(t), Seq("dow"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("dow"))
          .orderBy(col("n").desc, col("hr"))))
      .select(col("dow"), col("hr"), col("n").as("n_events"),
        expr("(1000000 * n) div tot").as("share_ppm"),
        when(col("rn") === 1, lit(1L)).otherwise(lit(0L)).as("is_peak"))
      .orderBy(col("dow"), col("hr"))
  }
}
