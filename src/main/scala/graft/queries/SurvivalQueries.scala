package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-8 survival/causal wave: Cox score test with a continuous
  * covariate over lead-time risk sets, the actuarial life table with
  * deterministic censoring, a sharp regression-discontinuity jump at a
  * price cutoff, the two-sample Cramér–von Mises statistic, and a
  * Baron–Kenny mediation decomposition. Exact integer/decimal moments
  * everywhere; divisions are pinned doubles quantized by PURE-double
  * ⌊x·10^k⌋ (identical IEEE sequence both engines — the DECIMAL
  * middleman rounds HALF_UP in Spark vs half-even in DuckDB and
  * diverged on 1 of ~2,400 day terms here) or the DECIMAL(28,6)
  * floor idiom where terms are few. The survival faces ride the
  * calendar-bounded event-time dim (suffix sums over ~2,400 day rows),
  * never a per-subject walk. */
object SurvivalQueries {

  val all: Seq[Q] = Seq(q586, q587, q588, q589, q590)

  /** Shared subject frame for the survival pair: orders with a
    * POSITIVE first-ship lead (the synthetic ship dates are not causal
    * in the generator, so the shipped-after-order subpopulation is the
    * survival-shaped slice — ~24% of orders), with time-to-event
    * t = first ship − order day and covariate x = totalprice in
    * kilodollars. One fact-sized pass; everything downstream is the
    * day dim. */
  private def leadSql: String = """
    |lead AS (
    |  SELECT o.o_orderkey AS id,
    |         epoch_us(min(l.l_shipdate)) // 86400000000
    |           - epoch_us(any_value(o.o_orderdate)) // 86400000000 AS t,
    |         CAST(floor(any_value(o.o_totalprice) / 1000) AS BIGINT) AS x
    |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    |  GROUP BY 1),
    |pos AS (SELECT * FROM lead WHERE t >= 1)""".stripMargin

  private def leadBase(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.orders(s, dir)
      .select(col("o_orderkey").as("id"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))" +
          " div 86400000000").as("od"),
        expr("CAST(floor(o_totalprice / 1000) AS BIGINT)").as("x"))
      .join(Tables.lineitem(s, dir).select(col("l_orderkey"),
        expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))" +
          " div 86400000000").as("sd")),
        col("id") === col("l_orderkey"))
      .groupBy(col("id"), col("od"), col("x"))
      .agg(min(col("sd")).as("fs"))
      .select(col("id"), (col("fs") - col("od")).as("t"), col("x"))
      .where(col("t") >= 1)

  /** Cox proportional-hazards SCORE test (β = 0, Breslow ties) of
    * order value against ship-lead hazard: U = Σ_t (sx_t − d_t·R̄_t),
    * I = Σ_t d_t·Var_t(x) over the risk sets R_t = {subjects with
    * T ≥ t}. The continuous-covariate sibling of the two-group logrank
    * (q number in the 400s): risk-set moments are SUFFIX sums over the
    * calendar-bounded day dim, per-day terms micro-quantized before
    * the one exact integer sum, z² = U²/I one final pinned double. */
  def q586: Q = Q(
    "q586_cox_score_price",
    Some(s"""
      |WITH ${leadSql},
      |day AS (
      |  SELECT t, count(*) AS d, sum(x) AS sx, sum(x * x) AS sx2
      |  FROM pos GROUP BY 1),
      |rs AS (
      |  SELECT t, d, sx,
      |         sum(d) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW AND
      |           UNBOUNDED FOLLOWING) AS r,
      |         sum(sx) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW AND
      |           UNBOUNDED FOLLOWING) AS rx,
      |         sum(sx2) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW AND
      |           UNBOUNDED FOLLOWING) AS rx2
      |  FROM day),
      |terms AS (
      |  SELECT
      |    CAST(floor(CAST(sx * r - d * rx AS DOUBLE)
      |      / CAST(r AS DOUBLE) * 1000000.0) AS BIGINT) AS u_t,
      |    CAST(floor(CAST(d AS DOUBLE)
      |        * CAST(CAST(rx2 AS HUGEINT) * r
      |               - CAST(rx AS HUGEINT) * rx AS DOUBLE)
      |        / (CAST(r AS DOUBLE) * CAST(r AS DOUBLE))
      |        * 1000000.0) AS BIGINT) AS i_t
      |  FROM rs),
      |agg AS (SELECT sum(u_t) AS u, sum(i_t) AS i FROM terms),
      |nn AS (SELECT count(*) AS n FROM pos)
      |SELECT CAST(nn.n AS BIGINT) AS n_subjects,
      |       CAST(agg.u AS BIGINT) AS u_micro,
      |       CAST(agg.i AS BIGINT) AS i_micro,
      |       CAST(floor(CAST(agg.u AS DOUBLE) * CAST(agg.u AS DOUBLE)
      |         / (1000000.0 * CAST(agg.i AS DOUBLE)) * 1000.0) AS BIGINT)
      |         AS z2_milli
      |FROM agg CROSS JOIN nn
      |""".stripMargin)) { (s, dir) =>
    val pos = leadBase(s, dir).materialize()
    val day = pos.groupBy(col("t"))
      .agg(count(lit(1)).as("d"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sx2"))
    // suffix sums over the event-time dim — calendar-bounded (~2,400
    // days), not fact-scaled, so the ordered window is legal here
    val wSuf = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val terms = day
      .withColumn("r", sum(col("d")).over(wSuf))
      .withColumn("rx", sum(col("sx")).over(wSuf))
      .withColumn("rx2", sum(col("sx2")).over(wSuf))
      .select(
        expr("CAST(floor(CAST(sx * r - d * rx AS DOUBLE)" +
          " / CAST(r AS DOUBLE) * 1000000.0) AS BIGINT)")
          .as("u_t"),
        expr("CAST(floor(CAST(d AS DOUBLE)" +
          " * CAST(CAST(rx2 AS DECIMAL(38,0)) * r" +
          " - CAST(rx AS DECIMAL(38,0)) * rx AS DOUBLE)" +
          " / (CAST(r AS DOUBLE) * CAST(r AS DOUBLE))" +
          " * 1000000.0) AS BIGINT)").as("i_t"))
    val agg = terms.agg(sum(col("u_t")).as("u"), sum(col("i_t")).as("i"))
    val nn = pos.agg(count(lit(1)).as("n"))
    agg.crossJoin(broadcast(nn))
      .select(col("n").as("n_subjects"), col("u").as("u_micro"),
        col("i").as("i_micro"),
        expr("CAST(floor(CAST(u AS DOUBLE) * CAST(u AS DOUBLE)" +
          " / (1000000.0 * CAST(i AS DOUBLE)) * 1000.0) AS BIGINT)")
          .as("z2_milli"))
  }

  /** Actuarial (grouped) life table over 90-day lead intervals with
    * DETERMINISTIC administrative censoring C = 30 + 17·(id mod 100):
    * effective exposure n′ = n − w/2 (the classic half-withdrawal
    * convention, kept exact as 2d/(2n − w)), q̂ micro-quantized per
    * interval, and survival S as the INTEGER floor-product fold — both
    * engines replay the identical ⌊S·(10⁶−q)/10⁶⌋ recurrence (DuckDB
    * list_reduce ≡ Spark aggregate over the ≤28-interval array), so
    * the sequential part runs on the interval dim, never the data. */
  def q587: Q = Q(
    "q587_actuarial_lifetable",
    Some(s"""
      |WITH ${leadSql},
      |obs AS (SELECT t, 30 + 17 * (id % 100) AS cdays FROM pos),
      |ye AS (SELECT least(t, cdays) AS y,
      |              CASE WHEN t <= cdays THEN 1 ELSE 0 END AS e FROM obs),
      |iv AS (SELECT y // 90 AS iv,
      |              count(*) FILTER (e = 1) AS d,
      |              count(*) FILTER (e = 0) AS w
      |       FROM ye GROUP BY 1),
      |en AS (SELECT iv, d, w,
      |              sum(d + w) OVER (ORDER BY iv ROWS BETWEEN CURRENT ROW
      |                AND UNBOUNDED FOLLOWING) AS n
      |       FROM iv),
      |qq AS (SELECT iv, n, d, w,
      |              (2000000 * d) // (2 * n - w) AS q_micro FROM en),
      |ql AS (SELECT list(iv ORDER BY iv) AS ivl, list(n ORDER BY iv) AS nl,
      |              list(d ORDER BY iv) AS dl, list(w ORDER BY iv) AS wl,
      |              list(q_micro ORDER BY iv) AS qs
      |       FROM qq),
      |ex AS (SELECT unnest(ivl) AS iv, unnest(nl) AS n_enter,
      |              unnest(dl) AS n_events, unnest(wl) AS n_censored,
      |              unnest(qs) AS q_micro,
      |              unnest(list_transform(range(1, len(qs) + 1),
      |                i -> list_reduce(
      |                  list_prepend(CAST(1000000 AS BIGINT),
      |                    list_slice(qs, 1, i)),
      |                  (a, b) -> (a * (1000000 - b)) // 1000000)))
      |                AS s_micro
      |       FROM ql)
      |SELECT CAST(90 * iv AS BIGINT) AS day_lo,
      |       CAST(n_enter AS BIGINT) AS n_enter,
      |       CAST(n_events AS BIGINT) AS n_events,
      |       CAST(n_censored AS BIGINT) AS n_censored,
      |       CAST(q_micro AS BIGINT) AS q_micro,
      |       CAST(s_micro AS BIGINT) AS s_micro
      |FROM ex ORDER BY day_lo
      |""".stripMargin)) { (s, dir) =>
    val obs = leadBase(s, dir)
      .select(col("t"), expr("30 + 17 * (id % 100)").as("cdays"))
    val ye = obs.select(least(col("t"), col("cdays")).as("y"),
      when(col("t") <= col("cdays"), 1L).otherwise(0L).as("e"))
    val iv = ye.groupBy(expr("y div 90").as("iv"))
      .agg(count(when(col("e") === 1, 1)).as("d"),
        count(when(col("e") === 0, 1)).as("w"))
    val wSuf = Window.orderBy(col("iv"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val qq = iv
      .withColumn("n", sum(col("d") + col("w")).over(wSuf))
      .withColumn("q_micro", expr("(2000000 * d) div (2 * n - w)"))
    // the survival product is genuinely sequential, but only over the
    // ≤28-interval dim: collect the interval rows into ONE array and
    // replay the integer floor-product per index — the identical
    // recurrence text the oracle's list_reduce left-folds
    qq.agg(sort_array(collect_list(struct(col("iv"), col("n"), col("d"),
        col("w"), col("q_micro")))).as("rs"))
      .select(explode(expr(
        """transform(rs, (r, i) -> named_struct(
          |  'day_lo', CAST(90 * r.iv AS BIGINT),
          |  'n_enter', r.n, 'n_events', r.d, 'n_censored', r.w,
          |  'q_micro', r.q_micro,
          |  's_micro', aggregate(
          |    slice(transform(rs, x -> x.q_micro), 1, i + 1),
          |    CAST(1000000 AS BIGINT),
          |    (acc, q) -> CAST(floor(CAST(acc * (1000000 - q) AS DOUBLE)
          |      / 1000000.0) AS BIGINT))))""".stripMargin)).as("r"))
      .select(col("r.day_lo").as("day_lo"), col("r.n_enter").as("n_enter"),
        col("r.n_events").as("n_events"),
        col("r.n_censored").as("n_censored"),
        col("r.q_micro").as("q_micro"), col("r.s_micro").as("s_micro"))
      .orderBy(col("day_lo"))
  }

  /** Sharp regression discontinuity at the $150k order-value cutoff:
    * local linear fits of the order's returned-line share (milli) on
    * centered price, separately on [−50k, 0) and [0, 50k]; the
    * "treatment jump" is the difference of the two intercepts at the
    * cutoff. Closed-form OLS from exact integer moments (the
    * intercept-at-0 form Σy·Σx² − Σx·Σxy over nΣx² − (Σx)²); the
    * synthetic generator has no discontinuity, so the jump doubles as
    * a placebo audit. */
  def q588: Q = Q(
    "q588_rdd_price_cutoff",
    Some("""
      |WITH b AS (
      |  SELECT o_orderkey AS id,
      |         CAST(floor(o_totalprice) AS BIGINT) - 150000 AS xx
      |  FROM orders
      |  WHERE o_totalprice >= 100000 AND o_totalprice < 200000),
      |y AS (
      |  SELECT b.xx,
      |         (1000 * count(*) FILTER (l.l_returnflag = 'R')) // count(*)
      |           AS yy
      |  FROM b JOIN lineitem l ON l.l_orderkey = b.id
      |  GROUP BY b.id, b.xx),
      |sides AS (
      |  SELECT CASE WHEN xx >= 0 THEN 'right' ELSE 'left' END AS side,
      |         count(*) AS n, sum(xx) AS sx, sum(yy) AS sy,
      |         sum(CAST(xx AS HUGEINT) * xx) AS sxx,
      |         sum(CAST(xx AS HUGEINT) * yy) AS sxy
      |  FROM y GROUP BY 1),
      |est AS (
      |  SELECT side, n,
      |         CAST(floor(CAST(CAST(sy * sxx - sx * sxy AS DOUBLE)
      |           / CAST(CAST(n AS HUGEINT) * sxx
      |                  - CAST(sx AS HUGEINT) * sx AS DOUBLE)
      |           AS DECIMAL(28,6)) * 1000) AS BIGINT) AS a_milli
      |  FROM sides)
      |SELECT CAST(max(CASE WHEN side = 'left' THEN n END) AS BIGINT)
      |         AS n_left,
      |       CAST(max(CASE WHEN side = 'right' THEN n END) AS BIGINT)
      |         AS n_right,
      |       CAST(max(CASE WHEN side = 'left' THEN a_milli END) AS BIGINT)
      |         AS a_left_milli,
      |       CAST(max(CASE WHEN side = 'right' THEN a_milli END) AS BIGINT)
      |         AS a_right_milli,
      |       CAST(max(CASE WHEN side = 'right' THEN a_milli END)
      |         - max(CASE WHEN side = 'left' THEN a_milli END) AS BIGINT)
      |         AS jump_milli
      |FROM est
      |""".stripMargin)) { (s, dir) =>
    val b = Tables.orders(s, dir)
      .where(col("o_totalprice") >= 100000 && col("o_totalprice") < 200000)
      .select(col("o_orderkey").as("id"),
        (expr("CAST(floor(o_totalprice) AS BIGINT)") - 150000L).as("xx"))
    val y = b.join(Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_returnflag")),
        col("id") === col("l_orderkey"))
      .groupBy(col("id"), col("xx"))
      .agg(expr("(1000 * count(CASE WHEN l_returnflag = 'R' THEN 1 END))" +
        " div count(1)").as("yy"))
    val sides = y
      .groupBy(when(col("xx") >= 0, "right").otherwise("left").as("side"))
      .agg(count(lit(1)).as("n"), sum(col("xx")).as("sx"),
        sum(col("yy")).as("sy"),
        sum(col("xx").cast("decimal(38,0)") * col("xx")).as("sxx"),
        sum(col("xx").cast("decimal(38,0)") * col("yy")).as("sxy"))
    sides
      .withColumn("a_milli",
        expr("CAST(floor(CAST(CAST(sy * sxx - sx * sxy AS DOUBLE)" +
          " / CAST(CAST(n AS DECIMAL(38,0)) * sxx" +
          " - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)" +
          " AS DECIMAL(28,6)) * 1000) AS BIGINT)"))
      .agg(
        max(when(col("side") === "left", col("n"))).as("n_left"),
        max(when(col("side") === "right", col("n"))).as("n_right"),
        max(when(col("side") === "left", col("a_milli")))
          .as("a_left_milli"),
        max(when(col("side") === "right", col("a_milli")))
          .as("a_right_milli"))
      .select(col("n_left"), col("n_right"), col("a_left_milli"),
        col("a_right_milli"),
        (col("a_right_milli") - col("a_left_milli")).as("jump_milli"))
  }

  /** Two-sample Cramér–von Mises statistic (purchase vs click values):
    * T = Σ_k c_k·(F₁−F₂)²·n₁n₂/N² over the combined support — the
    * whole-distribution companion of the q345 KS sup-difference. Both
    * ECDFs ride ONE bucket-parallel globalRankCums pass (the value dim
    * grows with the event log); the Σ is an exact HUGEINT with one
    * final pinned division. */
  def q589: Q = Q(
    "q589_cramer_von_mises",
    Some("""
      |WITH v AS (
      |  SELECT value,
      |         count(*) FILTER (event_type = 'purchase') AS c1,
      |         count(*) FILTER (event_type = 'click') AS c2
      |  FROM events WHERE event_type IN ('purchase', 'click')
      |  GROUP BY 1),
      |t AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM v),
      |cum AS (
      |  SELECT value, c1 + c2 AS ck,
      |         sum(c1) OVER (ORDER BY value) AS f1,
      |         sum(c2) OVER (ORDER BY value) AS f2
      |  FROM v),
      |num AS (
      |  SELECT sum(CAST(ck AS HUGEINT)
      |             * CAST(f1 * t.n2 - f2 * t.n1 AS HUGEINT)
      |             * (f1 * t.n2 - f2 * t.n1)) AS u
      |  FROM cum CROSS JOIN t)
      |SELECT CAST(t.n1 AS BIGINT) AS n1, CAST(t.n2 AS BIGINT) AS n2,
      |       CAST(floor(CAST(CAST(num.u AS DOUBLE)
      |         / (CAST(t.n1 + t.n2 AS DOUBLE) * (t.n1 + t.n2)
      |            * t.n1 * t.n2)
      |         AS DECIMAL(28,6)) * 1000000) AS BIGINT) AS t_micro
      |FROM num CROSS JOIN t
      |""".stripMargin)) { (s, dir) =>
    val v = Tables.events(s, dir)
      .where(col("event_type").isin("purchase", "click"))
      .groupBy(col("value"))
      .agg(count(when(col("event_type") === "purchase", 1)).as("c1"),
        count(when(col("event_type") === "click", 1)).as("c2"))
      .materialize() // distinct-value dim feeds totals AND both ECDFs
    val t = v.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    val cum = graft.dedup.SortedNeighborhood.globalRankCums(
        v.withColumn("__bkt", floor(col("value") / 8).cast("long")),
        idCol = "value", bucketCol = "__bkt", tieCols = Nil,
        cumCols = Seq("c1", "c2"))
      .select((col("c1") + col("c2")).as("ck"),
        col("__cum_c1").as("f1"), col("__cum_c2").as("f2"))
    cum.crossJoin(broadcast(t))
      .agg(sum(expr("CAST(ck AS DECIMAL(38,0))" +
        " * CAST(f1 * n2 - f2 * n1 AS DECIMAL(38,0))" +
        " * (f1 * n2 - f2 * n1)")).as("u"),
        max(col("n1")).as("n1"), max(col("n2")).as("n2"))
      .select(col("n1"), col("n2"),
        expr("CAST(floor(CAST(CAST(u AS DOUBLE)" +
          " / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2) * n1 * n2)" +
          " AS DECIMAL(28,6)) * 1000000) AS BIGINT)").as("t_micro"))
  }

  /** Baron–Kenny mediation decomposition of discount → quantity →
    * dollar revenue: total effect c (Y~X), first stage a (M~X), and
    * the two-regressor fit Y~X+M giving direct c′ and mediator slope b
    * — all closed-form from ONE pass of exact integer moments (the
    * 2×2 normal equations solved by Cramer's rule in HUGEINT). The
    * indirect path a·b is the one product of pinned doubles. In OLS
    * c = c′ + a·b identically — the milli-quantized outputs let the
    * oracle audit that identity to rounding. */
  def q590: Q = {
    val aExpr = "CAST(floor(CAST(CAST(sxm AS DOUBLE) / CAST(sxx AS DOUBLE)" +
      " AS DECIMAL(28,6)) * 1000) AS BIGINT)"
    val cExpr = "CAST(floor(CAST(CAST(sxy AS DOUBLE) / CAST(sxx AS DOUBLE)" +
      " AS DECIMAL(28,6)) * 1000) AS BIGINT)"
    // cross-products of two n²-scaled centered moments sit within ~3×
    // of the 128-bit ceiling at 100× — form them in DOUBLE (pinned,
    // identical text both engines) instead of exact integers
    val numB = "(CAST(sxx AS DOUBLE) * CAST(smy AS DOUBLE)" +
      " - CAST(sxm AS DOUBLE) * CAST(sxy AS DOUBLE))"
    val det = "(CAST(sxx AS DOUBLE) * CAST(smm AS DOUBLE)" +
      " - CAST(sxm AS DOUBLE) * CAST(sxm AS DOUBLE))"
    val numCp = "(CAST(smm AS DOUBLE) * CAST(sxy AS DOUBLE)" +
      " - CAST(sxm AS DOUBLE) * CAST(smy AS DOUBLE))"
    val bExpr = s"CAST(floor(CAST($numB / $det AS DECIMAL(28,6))" +
      " * 1000) AS BIGINT)"
    val cpExpr = s"CAST(floor(CAST($numCp / $det AS DECIMAL(28,6))" +
      " * 1000) AS BIGINT)"
    val indExpr = "CAST(floor(CAST((CAST(sxm AS DOUBLE)" +
      " / CAST(sxx AS DOUBLE))" +
      s" * ($numB / $det) AS DECIMAL(28,6))" +
      " * 1000) AS BIGINT)"
    Q("q590_mediation_decomposition",
      Some(s"""
        |WITH l AS (
        |  SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x,
        |         CAST(floor(l_quantity + 0.5) AS BIGINT) AS m,
        |         CAST(floor(l_extendedprice) AS BIGINT) AS yv
        |  FROM lineitem),
        |mo AS (
        |  SELECT count(*) AS n, sum(x) AS sx_, sum(m) AS sm_,
        |         sum(yv) AS sy_, sum(x * x) AS sxx_, sum(x * m) AS sxm_,
        |         sum(m * m) AS smm_, sum(x * yv) AS sxy_,
        |         sum(m * yv) AS smy_
        |  FROM l),
        |cs AS (
        |  SELECT n,
        |    CAST(n AS HUGEINT) * sxx_ - CAST(sx_ AS HUGEINT) * sx_ AS sxx,
        |    CAST(n AS HUGEINT) * sxm_ - CAST(sx_ AS HUGEINT) * sm_ AS sxm,
        |    CAST(n AS HUGEINT) * smm_ - CAST(sm_ AS HUGEINT) * sm_ AS smm,
        |    CAST(n AS HUGEINT) * sxy_ - CAST(sx_ AS HUGEINT) * sy_ AS sxy,
        |    CAST(n AS HUGEINT) * smy_ - CAST(sm_ AS HUGEINT) * sy_ AS smy
        |  FROM mo)
        |SELECT CAST(n AS BIGINT) AS n_lines,
        |       $aExpr AS a_milli, $cExpr AS c_milli, $bExpr AS b_milli,
        |       $cpExpr AS c_prime_milli, $indExpr AS indirect_milli
        |FROM cs
        |""".stripMargin)) { (s, dir) =>
      val l = Tables.lineitem(s, dir).select(
        expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)").as("x"),
        expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("m"),
        expr("CAST(floor(l_extendedprice) AS BIGINT)").as("yv"))
      l.agg(count(lit(1)).as("n"), sum(col("x")).as("sx_"),
          sum(col("m")).as("sm_"), sum(col("yv")).as("sy_"),
          sum(col("x") * col("x")).as("sxx_"),
          sum(col("x") * col("m")).as("sxm_"),
          sum(col("m") * col("m")).as("smm_"),
          sum(col("x") * col("yv")).as("sxy_"),
          sum(col("m") * col("yv")).as("smy_"))
        .select(col("n"),
          expr("CAST(n AS DECIMAL(38,0)) * sxx_" +
            " - CAST(sx_ AS DECIMAL(38,0)) * sx_").as("sxx"),
          expr("CAST(n AS DECIMAL(38,0)) * sxm_" +
            " - CAST(sx_ AS DECIMAL(38,0)) * sm_").as("sxm"),
          expr("CAST(n AS DECIMAL(38,0)) * smm_" +
            " - CAST(sm_ AS DECIMAL(38,0)) * sm_").as("smm"),
          expr("CAST(n AS DECIMAL(38,0)) * sxy_" +
            " - CAST(sx_ AS DECIMAL(38,0)) * sy_").as("sxy"),
          expr("CAST(n AS DECIMAL(38,0)) * smy_" +
            " - CAST(sm_ AS DECIMAL(38,0)) * sy_").as("smy"))
        .select(col("n").as("n_lines"),
          expr(aExpr).as("a_milli"), expr(cExpr).as("c_milli"),
          expr(bExpr).as("b_milli"), expr(cpExpr).as("c_prime_milli"),
          expr(indExpr).as("indirect_milli"))
    }
  }
}
