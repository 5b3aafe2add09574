package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-9 lot-sizing wave on q601's month-demand spine (setup K =
  * 50000, holding H = 10 per unit-month, identical constants so the
  * costs are directly comparable): the Wagner–Whitin OPTIMUM via the
  * exact DP over prefix-sum cost closed forms, the part-period
  * balancing and least-unit-cost heuristics (sequential folds — Spark
  * array-fold, DuckDB RECURSIVE walk, the engine-stable house shape),
  * a periodic-order-quantity sensitivity table, and the
  * Syntetos–Boylan demand-classification diagnostics. Month dim ≤~84
  * everywhere; cost(j,t) = K + H·((W_t−W_{j−1}) − j·(S_t−S_{j−1}))
  * from exact prefix arrays, so the DP min never re-sums demand. */
object LotSizingQueries {

  // declared BEFORE `all`: the oracle SQL strings interpolate these at
  // Q-construction time (Scala object init order — a val after `all`
  // would read as 0 inside the Seq initializer)
  private val K = 50000L
  private val H = 10L

  val all: Seq[Q] = Seq(q756, q757, q758, q759, q760)

  /** Oracle CTEs: `md(i, mo, d, n)` indexed month demands plus the
    * prefix arrays `pa(sp, wp)` — sp[k] = Σ_{u<k} d_u, wp[k] =
    * Σ_{u<k} u·d_u (1-indexed, length n+1, sp[1]=0). */
  private def sqlMd: String = """
    |m AS (
    |  SELECT year(l_shipdate) * 12 + month(l_shipdate) AS mo,
    |         sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS d
    |  FROM lineitem GROUP BY 1),
    |md AS (SELECT mo, d, row_number() OVER (ORDER BY mo) AS i,
    |              count(*) OVER () AS n FROM m),
    |pa AS (
    |  SELECT list_prepend(CAST(0 AS BIGINT),
    |           list(sd ORDER BY i)) AS sp,
    |         list_prepend(CAST(0 AS BIGINT),
    |           list(wd ORDER BY i)) AS wp
    |  FROM (SELECT i,
    |               sum(d) OVER (ORDER BY i) AS sd,
    |               sum(i * d) OVER (ORDER BY i) AS wd
    |        FROM md) z)""".stripMargin

  /** Spark month frame (i, mo, d) with count column n. */
  private def md(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    Tables.lineitem(s, dir)
      .groupBy((year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
        .as("mo"))
      .agg(sum(expr("CAST(floor(l_quantity + 0.5) AS BIGINT)")).as("d"))
      .withColumn("i", row_number().over(w.orderBy(col("mo"))))
      .withColumn("n", count(lit(1)).over(w.partitionBy(lit(1))))
  }

  /** Spark: one row with n, ds (demands in month order), sp, wp
    * prefix arrays (1-indexed with leading 0). */
  private def arrays(s: SparkSession, dir: String): DataFrame =
    md(s, dir)
      .agg(max(col("n")).as("nm"),
        expr("transform(array_sort(collect_list(struct(i, d)))," +
          " r -> r.d)").as("ds"))
      .select(col("nm"), col("ds"),
        expr("concat(array(CAST(0 AS BIGINT))," +
          " transform(sequence(1, CAST(nm AS INT))," +
          " k -> aggregate(slice(ds, 1, k), CAST(0 AS BIGINT)," +
          " (a, x) -> a + x)))").as("sp"),
        expr("concat(array(CAST(0 AS BIGINT))," +
          " transform(sequence(1, CAST(nm AS INT))," +
          " k -> aggregate(zip_with(slice(ds, 1, k)," +
          " sequence(1, k), (x, u) -> CAST(u AS BIGINT) * x)," +
          " CAST(0 AS BIGINT), (a, x) -> a + x)))").as("wp"))

  /** Wagner–Whitin optimal total cost: f(t) = min_j f(j−1) +
    * cost(j,t) with the prefix-array closed form — the exact optimum
    * the Silver-Meal face (q601) approximates; reported with the
    * lot-for-lot cost (K·n) it must beat. */
  def q756: Q = Q(
    "q756_wagner_whitin",
    Some(s"""
      |WITH RECURSIVE ${sqlMd},
      |walk(t, fl) AS (
      |  SELECT 0, [CAST(0 AS BIGINT)]
      |  UNION ALL
      |  SELECT w.t + 1,
      |         list_append(w.fl,
      |           list_min(list_transform(range(1, w.t + 2), j ->
      |             w.fl[j] + ${K}
      |             + ${H} * ((pa.wp[w.t + 2] - pa.wp[j])
      |                       - j * (pa.sp[w.t + 2] - pa.sp[j])))))
      |  FROM walk w CROSS JOIN pa
      |  WHERE w.t < (SELECT max(n) FROM md))
      |SELECT CAST((SELECT max(n) FROM md) AS BIGINT) AS n_months,
      |       CAST(fl[-1] AS BIGINT) AS ww_total_cost,
      |       CAST(${K} * (SELECT max(n) FROM md) AS BIGINT)
      |         AS lot_for_lot_cost
      |FROM walk WHERE t = (SELECT max(n) FROM md)
      |""".stripMargin)) { (s, dir) =>
    arrays(s, dir)
      .select(col("nm"),
        expr(s"""element_at(aggregate(sequence(1, CAST(nm AS INT)),
          |  array(CAST(0 AS BIGINT)),
          |  (fl, t) -> concat(fl, array(
          |    array_min(transform(sequence(1, t), j ->
          |      element_at(fl, j) + ${K}
          |      + ${H} * ((element_at(wp, t + 1) - element_at(wp, j))
          |        - CAST(j AS BIGINT) * (element_at(sp, t + 1)
          |          - element_at(sp, j)))))))), -1)""".stripMargin)
          .as("ww_total_cost"))
      .select(col("nm").as("n_months"), col("ww_total_cost"),
        (lit(K) * col("nm")).as("lot_for_lot_cost"))
  }

  /** Part-period balancing: extend the lot while cumulative holding
    * stays ≤ the setup cost, then cut — the "match holding to setup"
    * heuristic. Fold state (k months in lot, h holding, total). */
  def q757: Q = Q(
    "q757_part_period_balancing",
    Some(s"""
      |WITH RECURSIVE ${sqlMd},
      |walk(i, k, h, total) AS (
      |  SELECT 0, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
      |         CAST(0 AS BIGINT)
      |  UNION ALL
      |  SELECT w.i + 1,
      |    CASE WHEN w.k = 0 OR w.h + ${H} * w.k * md.d > ${K}
      |         THEN 1 ELSE w.k + 1 END,
      |    CASE WHEN w.k = 0 OR w.h + ${H} * w.k * md.d > ${K}
      |         THEN 0 ELSE w.h + ${H} * w.k * md.d END,
      |    w.total + CASE WHEN w.k = 0 OR w.h + ${H} * w.k * md.d > ${K}
      |                   THEN ${K} ELSE ${H} * w.k * md.d END
      |  FROM walk w JOIN md ON md.i = w.i + 1)
      |SELECT CAST((SELECT max(n) FROM md) AS BIGINT) AS n_months,
      |       CAST(total AS BIGINT) AS ppb_total_cost
      |FROM walk WHERE i = (SELECT max(n) FROM md)
      |""".stripMargin)) { (s, dir) =>
    md(s, dir)
      .agg(max(col("n")).as("nm"),
        expr("transform(array_sort(collect_list(struct(i, d)))," +
          " r -> r.d)").as("ds"))
      .select(col("nm").as("n_months"),
        expr(s"""aggregate(ds,
          |  named_struct('k', CAST(0 AS BIGINT),
          |    'h', CAST(0 AS BIGINT), 'total', CAST(0 AS BIGINT)),
          |  (a, d) -> CASE
          |    WHEN a.k = 0 OR a.h + ${H} * a.k * d > ${K}
          |    THEN named_struct('k', CAST(1 AS BIGINT),
          |      'h', CAST(0 AS BIGINT), 'total', a.total + ${K})
          |    ELSE named_struct('k', a.k + 1,
          |      'h', a.h + ${H} * a.k * d,
          |      'total', a.total + ${H} * a.k * d)
          |    END).total""".stripMargin).as("ppb_total_cost"))
  }

  /** Least-unit-cost: extend the lot while (K + holding)/units keeps
    * falling (compared exactly by cross-multiplication), cut when the
    * unit cost would rise. Fold state (k, h, q units, total). */
  def q758: Q = Q(
    "q758_least_unit_cost",
    Some(s"""
      |WITH RECURSIVE ${sqlMd},
      |walk(i, k, h, q, total) AS (
      |  SELECT 0, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
      |         CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      |  UNION ALL
      |  SELECT w.i + 1,
      |    CASE WHEN w.k = 0 OR (${K} + w.h + ${H} * w.k * md.d) * w.q
      |              > (${K} + w.h) * (w.q + md.d)
      |         THEN 1 ELSE w.k + 1 END,
      |    CASE WHEN w.k = 0 OR (${K} + w.h + ${H} * w.k * md.d) * w.q
      |              > (${K} + w.h) * (w.q + md.d)
      |         THEN 0 ELSE w.h + ${H} * w.k * md.d END,
      |    CASE WHEN w.k = 0 OR (${K} + w.h + ${H} * w.k * md.d) * w.q
      |              > (${K} + w.h) * (w.q + md.d)
      |         THEN md.d ELSE w.q + md.d END,
      |    w.total + CASE WHEN w.k = 0
      |              OR (${K} + w.h + ${H} * w.k * md.d) * w.q
      |                 > (${K} + w.h) * (w.q + md.d)
      |              THEN ${K} ELSE ${H} * w.k * md.d END
      |  FROM walk w JOIN md ON md.i = w.i + 1)
      |SELECT CAST((SELECT max(n) FROM md) AS BIGINT) AS n_months,
      |       CAST(total AS BIGINT) AS luc_total_cost
      |FROM walk WHERE i = (SELECT max(n) FROM md)
      |""".stripMargin)) { (s, dir) =>
    md(s, dir)
      .agg(max(col("n")).as("nm"),
        expr("transform(array_sort(collect_list(struct(i, d)))," +
          " r -> r.d)").as("ds"))
      .select(col("nm").as("n_months"),
        expr(s"""aggregate(ds,
          |  named_struct('k', CAST(0 AS BIGINT),
          |    'h', CAST(0 AS BIGINT), 'q', CAST(0 AS BIGINT),
          |    'total', CAST(0 AS BIGINT)),
          |  (a, d) -> CASE
          |    WHEN a.k = 0 OR (${K} + a.h + ${H} * a.k * d) * a.q
          |         > (${K} + a.h) * (a.q + d)
          |    THEN named_struct('k', CAST(1 AS BIGINT),
          |      'h', CAST(0 AS BIGINT), 'q', d, 'total', a.total + ${K})
          |    ELSE named_struct('k', a.k + 1,
          |      'h', a.h + ${H} * a.k * d, 'q', a.q + d,
          |      'total', a.total + ${H} * a.k * d)
          |    END).total""".stripMargin).as("luc_total_cost"))
  }

  /** Periodic-order-quantity sensitivity: total cost when ordering
    * every p months, p = 1..6 — fully RELATIONAL (block holding from
    * the prefix closed form), no fold; the sweet spot approximates
    * EOQ time supply. */
  def q759: Q = Q(
    "q759_poq_sensitivity",
    Some(s"""
      |WITH ${sqlMd},
      |pp AS (SELECT unnest(range(1, 7)) AS p),
      |bl AS (
      |  SELECT pp.p, (md.i - 1) // pp.p AS blk,
      |         sum(${H} * ((md.i - 1) % pp.p) * md.d) AS hold
      |  FROM md CROSS JOIN pp GROUP BY 1, 2)
      |SELECT CAST(p AS BIGINT) AS period_months,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(${K} * count(*) + sum(hold) AS BIGINT)
      |         AS total_cost
      |FROM bl GROUP BY p ORDER BY period_months
      |""".stripMargin)) { (s, dir) =>
    val pp = md(s, dir).sparkSession.range(1, 7)
      .select(col("id").as("p"))
    md(s, dir).crossJoin(broadcast(pp))
      .groupBy(col("p"), expr("(i - 1) div p").as("blk"))
      .agg(sum(lit(H) * expr("(i - 1) % p") * col("d")).as("hold"))
      .groupBy(col("p"))
      .agg(count(lit(1)).as("n_orders"), sum(col("hold")).as("sh"))
      .select(col("p").as("period_months"), col("n_orders"),
        (lit(K) * col("n_orders") + col("sh")).as("total_cost"))
      .orderBy(col("period_months"))
  }

  /** Syntetos–Boylan demand classification: ADI (mean inter-demand
    * interval over the month grid) and CV² of nonzero demand sizes —
    * the (1.32, 0.49) quadrant rule naming the demand smooth /
    * erratic / intermittent / lumpy, which decides whether
    * WW-style lot-sizing or Croston-style forecasting applies. */
  def q760: Q = Q(
    "q760_demand_classification",
    Some(s"""
      |WITH ${sqlMd},
      |sz AS (
      |  SELECT count(*) AS nz, sum(d) AS sd,
      |         sum(CAST(d AS HUGEINT) * d) AS sdd,
      |         max(n) AS n
      |  FROM md WHERE d > 0)
      |SELECT CAST(n AS BIGINT) AS n_months,
      |       CAST(nz AS BIGINT) AS nonzero_months,
      |       CAST((1000 * n) // nz AS BIGINT) AS adi_milli,
      |       CAST((1000000 * (CAST(nz AS HUGEINT) * sdd
      |              - CAST(sd AS HUGEINT) * sd))
      |            // (CAST(sd AS HUGEINT) * sd) AS BIGINT)
      |         AS cv2_micro,
      |       CASE WHEN (1000 * n) // nz <= 1320
      |              AND (1000000 * (CAST(nz AS HUGEINT) * sdd
      |                    - CAST(sd AS HUGEINT) * sd))
      |                  // (CAST(sd AS HUGEINT) * sd) <= 490000
      |            THEN 'smooth'
      |            WHEN (1000 * n) // nz <= 1320 THEN 'erratic'
      |            WHEN (1000000 * (CAST(nz AS HUGEINT) * sdd
      |                   - CAST(sd AS HUGEINT) * sd))
      |                 // (CAST(sd AS HUGEINT) * sd) <= 490000
      |            THEN 'intermittent' ELSE 'lumpy' END AS sb_class
      |FROM sz
      |""".stripMargin)) { (s, dir) =>
    md(s, dir).where(col("d") > 0)
      .agg(count(lit(1)).as("nz"), sum(col("d")).as("sd"),
        sum(col("d").cast("decimal(38,0)") * col("d")).as("sdd"),
        max(col("n")).as("n"))
      .select(col("n").cast("long").as("n_months"),
        col("nz").as("nonzero_months"),
        expr("CAST((1000 * n) div nz AS BIGINT)").as("adi_milli"),
        expr("CAST((1000000 * (CAST(nz AS DECIMAL(38,0)) * sdd" +
          " - CAST(sd AS DECIMAL(38,0)) * sd))" +
          " div (CAST(sd AS DECIMAL(38,0)) * sd) AS BIGINT)")
          .as("cv2_micro"),
        expr("CASE WHEN (1000 * n) div nz <= 1320" +
          " AND (1000000 * (CAST(nz AS DECIMAL(38,0)) * sdd" +
          " - CAST(sd AS DECIMAL(38,0)) * sd))" +
          " div (CAST(sd AS DECIMAL(38,0)) * sd) <= 490000" +
          " THEN 'smooth'" +
          " WHEN (1000 * n) div nz <= 1320 THEN 'erratic'" +
          " WHEN (1000000 * (CAST(nz AS DECIMAL(38,0)) * sdd" +
          " - CAST(sd AS DECIMAL(38,0)) * sd))" +
          " div (CAST(sd AS DECIMAL(38,0)) * sd) <= 490000" +
          " THEN 'intermittent' ELSE 'lumpy' END").as("sb_class"))
  }
}
