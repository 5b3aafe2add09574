package graft.queries

import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-7 audit wave (closing): backlog age by priority at a
  * snapshot, per-brand price-volatility ladder, duplicate-invoice
  * detection, revenue mix by customer tenure, and the I-MR
  * (individuals/moving-range) control chart. Pure compositions —
  * exact order statistics, exact counts, embedded SPC constants. */
object AuditQueries {

  val all: Seq[Q] = Seq(q581, q582, q583, q584, q585)

  /** Backlog age distribution by priority at the 1999-01-01 snapshot:
    * orders placed but not yet fully shipped, their age quantiles per
    * priority class — is the queue aging fairly? (The static snapshot
    * of what the q481 replay shows dynamically.) Exact per-class
    * order statistics. */
  def q581: Q = {
    val cutoff = 10592 // epoch day of 1999-01-01
    Q("q581_backlog_age_by_priority",
      Some(s"""
        |WITH ord AS (
        |  SELECT o.o_orderpriority AS prio,
        |         epoch_us(o.o_orderdate) // 86400000000 AS a,
        |         max(epoch_us(l.l_shipdate) // 86400000000) AS done
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |  GROUP BY o.o_orderkey, 1, 2),
        |open_ AS (
        |  SELECT prio, $cutoff - a AS age
        |  FROM ord WHERE a <= $cutoff AND done > $cutoff),
        |qs AS (
        |  SELECT prio, p.p,
        |         max(CASE WHEN rn = (p.p * n + 999) // 1000 THEN age END)
        |           AS v
        |  FROM (SELECT prio, age,
        |               row_number() OVER (PARTITION BY prio ORDER BY age)
        |                 AS rn,
        |               count(*) OVER (PARTITION BY prio) AS n
        |        FROM open_) r
        |  CROSS JOIN (SELECT unnest([500, 900]) AS p) p
        |  GROUP BY 1, 2),
        |ct AS (SELECT prio, count(*) AS n_open FROM open_ GROUP BY 1)
        |SELECT ct.prio AS priority, CAST(ct.n_open AS BIGINT) AS n_open,
        |       CAST(max(CASE WHEN qs.p = 500 THEN qs.v END) AS BIGINT)
        |         AS age_p50_days,
        |       CAST(max(CASE WHEN qs.p = 900 THEN qs.v END) AS BIGINT)
        |         AS age_p90_days
        |FROM ct JOIN qs ON qs.prio = ct.prio
        |GROUP BY 1, 2 ORDER BY priority
        |""".stripMargin)) { (s, dir) =>
      val ord = Tables.orders(s, dir)
        .select(col("o_orderkey").as("id"),
          col("o_orderpriority").as("prio"),
          expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))" +
            " div 86400000000").as("a"))
        .join(Tables.lineitem(s, dir)
          .select(col("l_orderkey"),
            expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))" +
              " div 86400000000").as("sd")),
          col("id") === col("l_orderkey"))
        .groupBy(col("id"), col("prio"), col("a"))
        .agg(max(col("sd")).as("done"))
      val open = ord.where(col("a") <= cutoff && col("done") > cutoff)
        .select(col("prio"), (lit(cutoff.toLong) - col("a")).as("age"))
        .materialize()
      val qs = graft.operators.OrderStats.quantilesDisc(
          open, Seq("prio"), "age", Seq(500, 900))
        .groupBy(col("prio").as("qprio"))
        .agg(max(when(col("permille") === 500, col("value")))
          .as("age_p50_days"),
          max(when(col("permille") === 900, col("value")))
            .as("age_p90_days"))
      open.groupBy(col("prio")).agg(count(lit(1)).as("n_open"))
        .join(broadcast(qs), col("qprio") === col("prio"))
        .select(col("prio").as("priority"), col("n_open"),
          col("age_p50_days"), col("age_p90_days"))
        .orderBy(col("priority"))
    }
  }

  /** Price-volatility ladder: coefficient of variation of the monthly
    * unit price per brand (top 10 most volatile) — which catalogs are
    * repricing hardest. Unit prices are exact revenue/quantity
    * rationals milli-quantized per month; CV = √(nΣx²−(Σx)²)/Σx is
    * one exactly-rounded expression per brand. */
  def q582: Q = Q(
    "q582_price_volatility",
    Some("""
      |WITH bm AS (
      |  SELECT p.p_brand AS brand,
      |         year(l.l_shipdate) * 12 + month(l.l_shipdate) AS mo,
      |         (1000 * CAST(sum(CAST(l.l_extendedprice * 100 AS HUGEINT))
      |                 AS BIGINT))
      |           // sum(CAST(floor(l.l_quantity + 0.5) AS BIGINT)) AS up
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  GROUP BY 1, 2),
      |mo_ AS (
      |  SELECT brand, count(*) AS n, sum(up) AS sx,
      |         sum(CAST(up AS HUGEINT) * up) AS q
      |  FROM bm GROUP BY 1 HAVING count(*) >= 12)
      |SELECT brand, CAST(n AS BIGINT) AS n_months,
      |       CAST(sx // (1000 * n) AS BIGINT) AS mean_price_cents,
      |       CAST(floor(CAST(
      |           sqrt(CAST(CAST(n AS HUGEINT) * q
      |                - CAST(sx AS HUGEINT) * sx AS DOUBLE))
      |             / CAST(sx AS DOUBLE)
      |         AS DECIMAL(28,6)) * 1000) AS BIGINT) AS cv_milli
      |FROM mo_
      |ORDER BY cv_milli DESC, brand LIMIT 10
      |""".stripMargin)) { (s, dir) =>
    val bm = Tables.lineitem(s, dir)
      .join(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand").as("brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("brand"),
        (year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
          .as("mo"))
      .agg(expr("(1000 * CAST(sum(CAST(l_extendedprice * 100" +
        " AS DECIMAL(38,0))) AS BIGINT))" +
        " div sum(CAST(floor(l_quantity + 0.5) AS BIGINT))").as("up"))
    bm.groupBy(col("brand"))
      .agg(count(lit(1)).as("n"), sum(col("up")).as("sx"),
        sum(col("up").cast("decimal(38,0)") * col("up")).as("q"))
      .where(col("n") >= 12)
      .select(col("brand"), col("n").as("n_months"),
        expr("sx div (1000 * n)").as("mean_price_cents"),
        expr("""CAST(floor(CAST(
            sqrt(CAST(CAST(n AS DECIMAL(38,0)) * q
                 - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE))
              / CAST(sx AS DOUBLE)
          AS DECIMAL(28,6)) * 1000) AS BIGINT)""").as("cv_milli"))
      .orderBy(col("cv_milli").desc, col("brand"))
      .limit(10)
  }

  /** Duplicate-invoice screen: pairs of orders by the SAME customer
    * with near-identical totals (within $100) inside 120 days — the
    * audit-analytics double-billing test, tolerance-widened because
    * these synthetic totals are near-continuous (exact-cent repeats
    * never occur — probed). The self-join keys on the customer, so
    * the pair fan-out is bounded by per-customer order counts. */
  def q583: Q = Q(
    "q583_duplicate_invoices",
    Some("""
      |WITH o AS (
      |  SELECT o_orderkey AS id, o_custkey AS k,
      |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
      |         epoch_us(o_orderdate) // 86400000000 AS d
      |  FROM orders),
      |pr AS (
      |  SELECT a.k, a.c, abs(a.d - b.d) AS gap
      |  FROM o a JOIN o b ON a.k = b.k AND a.id < b.id
      |  WHERE abs(a.c - b.c) <= 10000 AND abs(a.d - b.d) <= 120),
      |ag AS (
      |  SELECT count(*) AS n_pairs, count(DISTINCT k) AS n_customers,
      |         coalesce(sum(CASE WHEN gap <= 30 THEN 1 ELSE 0 END), 0)
      |           AS within_month,
      |         coalesce(sum(c), 0) AS exposure_cents
      |  FROM pr)
      |SELECT CAST(n_pairs AS BIGINT) AS n_suspect_pairs,
      |       CAST(n_customers AS BIGINT) AS n_customers,
      |       CAST(within_month AS BIGINT) AS n_within_month,
      |       CAST(exposure_cents AS BIGINT) AS exposure_cents
      |FROM ag
      |""".stripMargin)) { (s, dir) =>
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey").as("id"), col("o_custkey").as("k"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))" +
          " div 86400000000").as("d"))
      .materialize()
    val b = o.select(col("id").as("bid"), col("k").as("bk"),
      col("c").as("bc"), col("d").as("bd"))
    val pr = o.join(b, col("k") === col("bk") && col("id") < col("bid"))
      .where(abs(col("c") - col("bc")) <= 10000
        && abs(col("d") - col("bd")) <= 120)
      .select(col("k"), col("c"), abs(col("d") - col("bd")).as("gap"))
    pr.agg(count(lit(1)).as("n_suspect_pairs"),
      countDistinct(col("k")).as("n_customers"),
      coalesce(sum(when(col("gap") <= 30, 1L).otherwise(0L)), lit(0L))
        .as("n_within_month"),
      coalesce(sum(col("c")), lit(0L)).as("exposure_cents"))
  }

  /** Revenue mix by customer tenure: what share of each order-year's
    * revenue comes from customers in their 1st/2nd/3rd+ year since
    * first purchase — the acquisition-vs-retention decomposition
    * behind every "growth quality" review (the mix view of q293's
    * new-vs-returning counts). Exact integers. */
  def q584: Q = Q(
    "q584_tenure_revenue_mix",
    Some("""
      |WITH fo AS (
      |  SELECT o_custkey AS k, min(year(o_orderdate)) AS y0
      |  FROM orders GROUP BY 1),
      |rv AS (
      |  SELECT year(o.o_orderdate) AS yr,
      |         least(year(o.o_orderdate) - fo.y0, 2) AS tenure,
      |         CAST(sum(CAST(o.o_totalprice * 100 AS HUGEINT)) // 100
      |              AS BIGINT) AS x
      |  FROM orders o JOIN fo ON fo.k = o.o_custkey
      |  GROUP BY 1, 2),
      |yt AS (SELECT yr, sum(x) AS tot FROM rv GROUP BY 1)
      |SELECT CAST(rv.yr AS BIGINT) AS order_year,
      |       CAST(rv.tenure AS BIGINT) AS tenure_years_capped,
      |       CAST(rv.x AS BIGINT) AS revenue_dollars,
      |       CAST((1000 * rv.x) // yt.tot AS BIGINT) AS share_milli
      |FROM rv JOIN yt ON yt.yr = rv.yr
      |ORDER BY order_year, tenure_years_capped
      |""".stripMargin)) { (s, dir) =>
    val fo = Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("k"))
      .agg(min(year(col("o_orderdate"))).as("y0"))
    val rv = Tables.orders(s, dir)
      .join(fo, col("k") === col("o_custkey"))
      .groupBy(year(col("o_orderdate")).as("yr"),
        least(year(col("o_orderdate")) - col("y0"), lit(2)).as("tenure"))
      .agg(expr("CAST(sum(CAST(o_totalprice * 100 AS DECIMAL(38,0)))" +
        " div 100 AS BIGINT)").as("x"))
      .materialize() // year×tenure dim
    val yt = rv.groupBy(col("yr").as("jyr")).agg(sum(col("x")).as("tot"))
    rv.join(broadcast(yt), col("jyr") === col("yr"))
      .select(col("yr").cast("long").as("order_year"),
        col("tenure").cast("long").as("tenure_years_capped"),
        col("x").as("revenue_dollars"),
        expr("(1000 * x) div tot").as("share_milli"))
      .orderBy(col("order_year"), col("tenure_years_capped"))
  }

  /** I-MR (individuals / moving-range) control chart on daily
    * revenue: limits X̄ ± 2.66·M̄R and MR < 3.267·M̄R (embedded SPC
    * constants) — the ungrouped sibling of the X̄-R chart (q532) for
    * when there is no rational subgroup. Moving ranges come from the
    * day-value join; all comparisons pinned doubles over exact
    * sums. */
  def q585: Q = {
    val e2 = "2.66"; val d4 = "3.267"
    Q("q585_xmr_chart",
      Some(s"""
        |WITH ${Scaffolds.sqlDailyDollars},
        |mr AS (
        |  SELECT a.day, a.x, abs(a.x - b.x) AS r
        |  FROM grid a JOIN grid b ON b.day = a.day - 1),
        |cl AS (SELECT count(*) AS m, sum(x) AS sx, sum(r) AS sr FROM mr),
        |oc AS (
        |  SELECT sum(CASE WHEN CAST(mr.x AS DOUBLE)
        |           > CAST(cl.sx AS DOUBLE) / CAST(cl.m AS DOUBLE)
        |             + $e2 * CAST(cl.sr AS DOUBLE) / CAST(cl.m AS DOUBLE)
        |           OR CAST(mr.x AS DOUBLE)
        |           < CAST(cl.sx AS DOUBLE) / CAST(cl.m AS DOUBLE)
        |             - $e2 * CAST(cl.sr AS DOUBLE) / CAST(cl.m AS DOUBLE)
        |           THEN 1 ELSE 0 END) AS x_ooc,
        |         sum(CASE WHEN CAST(mr.r AS DOUBLE)
        |           > $d4 * CAST(cl.sr AS DOUBLE) / CAST(cl.m AS DOUBLE)
        |           THEN 1 ELSE 0 END) AS mr_ooc
        |  FROM mr CROSS JOIN cl)
        |SELECT (SELECT CAST(m AS BIGINT) FROM cl) AS n_days,
        |       (SELECT CAST(sx // m AS BIGINT) FROM cl)
        |         AS centerline_dollars,
        |       (SELECT CAST(sr // m AS BIGINT) FROM cl)
        |         AS mean_moving_range,
        |       CAST(oc.x_ooc AS BIGINT) AS x_out_of_control,
        |       CAST(oc.mr_ooc AS BIGINT) AS mr_out_of_control
        |FROM oc
        |""".stripMargin)) { (s, dir) =>
      val grid = Scaffolds.dailyDollars(s, dir)
      val mr = grid.as("a")
        .join(grid.select((col("day") + 1).as("bday"), col("x").as("bx")),
          col("bday") === col("day"))
        .select(col("x"), abs(col("x") - col("bx")).as("r"))
        .materialize() // day dim
      val cl = mr.agg(count(lit(1)).as("m"), sum(col("x")).as("sx"),
        sum(col("r")).as("sr"))
      def xb = "CAST(sx AS DOUBLE) / CAST(m AS DOUBLE)"
      def rb = "CAST(sr AS DOUBLE) / CAST(m AS DOUBLE)"
      mr.crossJoin(broadcast(cl))
        .agg(sum(expr(s"CASE WHEN CAST(x AS DOUBLE) > $xb + $e2 * $rb" +
          s" OR CAST(x AS DOUBLE) < $xb - $e2 * $rb THEN 1 ELSE 0 END"))
          .as("x_ooc"),
          sum(expr(s"CASE WHEN CAST(r AS DOUBLE) > $d4 * $rb" +
            " THEN 1 ELSE 0 END")).as("mr_ooc"),
          max(col("m")).as("m"), max(col("sx")).as("sx"),
          max(col("sr")).as("sr"))
        .select(col("m").as("n_days"),
          expr("sx div m").as("centerline_dollars"),
          expr("sr div m").as("mean_moving_range"),
          col("x_ooc").cast("long").as("x_out_of_control"),
          col("mr_ooc").cast("long").as("mr_out_of_control"))
    }
  }
}
