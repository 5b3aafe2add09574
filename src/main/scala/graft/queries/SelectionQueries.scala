package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-8 selection wave: VIKOR multi-criteria supplier ranking, the
  * secretary-rule optimal-stopping replay, the np control chart for
  * daily return counts, Blomqvist's quadrant dependence, and the
  * turning-point randomness test. Sequential pieces fold over
  * dim-sized arrays; the rest is exact counts/order statistics with
  * pinned finals. */
object SelectionQueries {

  val all: Seq[Q] = Seq(q636, q637, q638, q639, q640)

  /** VIKOR compromise ranking of the top-10-volume suppliers on three
    * criteria (revenue ↑, return rate ↓, avg lead ↓): linear
    * min–max-normalized S (group utility) and R (worst regret), then
    * Q = ½·S* + ½·R* — the compromise TOPSIS refuses to make
    * explicit. All normalizations are exact rationals micro-quantized
    * through shared pinned text; the candidate dim is a fixed
    * top-10. */
  def q636: Q = {
    def norm(v: String, lo: String, hi: String) =
      s"CAST(floor((CAST($v AS DOUBLE) - $lo)" +
        s" / greatest($hi - $lo, 1.0)" +
        " * 1000000.0) AS BIGINT)"
    Q("q636_vikor_suppliers",
      Some(s"""
        |WITH sp AS (
        |  SELECT l_suppkey AS sk, count(*) AS vol,
        |         sum(CAST(l_extendedprice * 100 AS HUGEINT)) AS rev,
        |         (1000000 * sum(CASE WHEN l_returnflag = 'R' THEN 1
        |            ELSE 0 END)) // count(*) AS rr
        |  FROM lineitem GROUP BY 1),
        |top AS (SELECT * FROM sp ORDER BY vol DESC, sk LIMIT 10),
        |bounds AS (
        |  SELECT CAST(min(rev) AS DOUBLE) AS rev_lo,
        |         CAST(max(rev) AS DOUBLE) AS rev_hi,
        |         CAST(min(rr) AS DOUBLE) AS rr_lo,
        |         CAST(max(rr) AS DOUBLE) AS rr_hi
        |  FROM top),
        |sc AS (
        |  SELECT sk, vol, rev, rr,
        |         1000000 - ${norm("rev", "b.rev_lo", "b.rev_hi")} AS d1,
        |         ${norm("rr", "b.rr_lo", "b.rr_hi")} AS d2
        |  FROM top CROSS JOIN bounds b),
        |sr AS (SELECT sk, vol, (d1 + d2) // 2 AS s_micro,
        |              greatest(d1, d2) AS r_micro FROM sc),
        |bb AS (SELECT min(s_micro) AS slo, max(s_micro) AS shi,
        |              min(r_micro) AS rlo, max(r_micro) AS rhi FROM sr)
        |SELECT CAST(sk AS BIGINT) AS suppkey, CAST(vol AS BIGINT) AS n_lines,
        |       CAST(s_micro AS BIGINT) AS s_micro,
        |       CAST(r_micro AS BIGINT) AS r_micro,
        |       CAST((500000 * (s_micro - bb.slo)) // greatest(bb.shi - bb.slo, 1)
        |         + (500000 * (r_micro - bb.rlo)) // greatest(bb.rhi - bb.rlo, 1)
        |         AS BIGINT) AS q_micro
        |FROM sr CROSS JOIN bb
        |ORDER BY q_micro, suppkey
        |""".stripMargin)) { (s, dir) =>
      val sp = Tables.lineitem(s, dir)
        .groupBy(col("l_suppkey").as("sk"))
        .agg(count(lit(1)).as("vol"),
          sum(expr("CAST(l_extendedprice * 100 AS DECIMAL(38,0))"))
            .as("rev"),
          expr("(1000000 * sum(CASE WHEN l_returnflag = 'R' THEN 1" +
            " ELSE 0 END)) div count(1)").as("rr"))
      val top = sp.orderBy(col("vol").desc, col("sk")).limit(10)
        .materialize() // bounds AND scores read the fixed candidates
      val bounds = top.agg(
        expr("CAST(min(rev) AS DOUBLE)").as("rev_lo"),
        expr("CAST(max(rev) AS DOUBLE)").as("rev_hi"),
        expr("CAST(min(rr) AS DOUBLE)").as("rr_lo"),
        expr("CAST(max(rr) AS DOUBLE)").as("rr_hi"))
      val sc = top.crossJoin(broadcast(bounds))
        .select(col("sk"), col("vol"),
          (lit(1000000L) - expr("CAST(floor((CAST(rev AS DOUBLE)" +
            " - rev_lo) / greatest(rev_hi - rev_lo, 1.0)" +
            " * 1000000.0) AS BIGINT)")).as("d1"),
          expr("CAST(floor((CAST(rr AS DOUBLE) - rr_lo)" +
            " / greatest(rr_hi - rr_lo, 1.0)" +
            " * 1000000.0) AS BIGINT)").as("d2"))
      val sr = sc.select(col("sk"), col("vol"),
          expr("(d1 + d2) div 2").as("s_micro"),
          greatest(col("d1"), col("d2")).as("r_micro"))
        .materialize()
      val bb = sr.agg(min(col("s_micro")).as("slo"),
        max(col("s_micro")).as("shi"), min(col("r_micro")).as("rlo"),
        max(col("r_micro")).as("rhi"))
      sr.crossJoin(broadcast(bb))
        .select(col("sk").as("suppkey"), col("vol").as("n_lines"),
          col("s_micro"), col("r_micro"),
          expr("(500000 * (s_micro - slo)) div greatest(shi - slo, 1)" +
            " + (500000 * (r_micro - rlo)) div greatest(rhi - rlo, 1)")
            .as("q_micro"))
        .orderBy(col("q_micro"), col("suppkey"))
    }
  }

  /** Secretary-rule (37%) optimal-stopping replay over the month's
    * order stream: per month, observe the first ⌊n/e⌋ orders (by
    * arrival = orderkey), then take the FIRST order beating every
    * observed one; score how often the rule captures the month's true
    * maximum. Fully relational: month-partitioned arrival ranks, the
    * observed max as a rank-bounded aggregate, the pick as the
    * min-rank qualifying arrival — no sequential fold at all. */
  def q637: Q = Q(
    "q637_secretary_rule",
    Some("""
      |WITH o AS (
      |  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS mo,
      |         o_orderkey AS id,
      |         CAST(o_totalprice * 100 AS HUGEINT) AS v
      |  FROM orders),
      |rk AS (
      |  SELECT mo, v,
      |         row_number() OVER (PARTITION BY mo ORDER BY id) AS rn,
      |         count(*) OVER (PARTITION BY mo) AS n
      |  FROM o),
      |km AS (
      |  SELECT mo, max(n) AS n, max(v) AS best,
      |         CAST(floor(CAST(max(n) AS DOUBLE) / 2.718281828459045)
      |              AS BIGINT) AS k
      |  FROM rk GROUP BY 1),
      |mx AS (
      |  SELECT rk.mo, coalesce(max(rk.v), -1) AS mx
      |  FROM rk JOIN km ON rk.mo = km.mo AND rk.rn <= km.k
      |  GROUP BY 1),
      |cand AS (
      |  SELECT rk.mo, min(rk.rn) AS prn
      |  FROM rk JOIN km ON rk.mo = km.mo
      |  JOIN mx ON rk.mo = mx.mo
      |  WHERE rk.rn > km.k AND rk.v > mx.mx
      |  GROUP BY 1),
      |pick AS (
      |  SELECT km.mo, km.n, km.best,
      |         coalesce(pv.v, -1) AS picked
      |  FROM km
      |  LEFT JOIN cand ON km.mo = cand.mo
      |  LEFT JOIN rk pv ON pv.mo = cand.mo AND pv.rn = cand.prn)
      |SELECT CAST(count(*) AS BIGINT) AS n_months,
      |       CAST(count(*) FILTER (picked = best) AS BIGINT) AS n_best,
      |       CAST(count(*) FILTER (picked < 0) AS BIGINT) AS n_no_pick,
      |       CAST((1000 * count(*) FILTER (picked = best)) // count(*)
      |            AS BIGINT) AS best_rate_permille
      |FROM pick
      |""".stripMargin)) { (s, dir) =>
    // RELATIONAL form, no fold: per month the rule is "max over the
    // first k arrivals, then the first later arrival that beats it" —
    // month-partitioned windows + two dim-sized joins. (The fold
    // formulation hit a DuckDB list_reduce batch-evaluation bug —
    // wrong on 3 of 80 rows in full scans, correct row-filtered — so
    // the oracle avoids list_reduce for MULTI-ROW folds entirely.)
    val o = Tables.orders(s, dir)
      .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .as("mo"), col("o_orderkey").as("id"),
        expr("CAST(o_totalprice * 100 AS DECIMAL(38,0))").as("v"))
    val wm = org.apache.spark.sql.expressions.Window.partitionBy(col("mo"))
    val rk = o
      .withColumn("rn", row_number().over(wm.orderBy(col("id"))))
      .withColumn("n", count(lit(1)).over(wm))
      .select(col("mo"), col("v"), col("rn"), col("n"))
      .materialize() // km, mx and the candidate probe read it
    val km = rk.groupBy(col("mo"))
      .agg(max(col("n")).as("n"), max(col("v")).as("best"),
        expr("CAST(floor(CAST(max(n) AS DOUBLE) / 2.718281828459045)" +
          " AS BIGINT)").as("k"))
      .materialize()
    val mx = rk.join(broadcast(km.select(col("mo").as("kmo"), col("k"))),
        col("mo") === col("kmo") && col("rn") <= col("k"))
      .groupBy(col("mo")).agg(coalesce(max(col("v")), lit(-1)).as("mx"))
    val cand = rk
      .join(broadcast(km.select(col("mo").as("kmo"), col("k"))),
        col("mo") === col("kmo"))
      .join(broadcast(mx.withColumnRenamed("mo", "xmo")),
        col("mo") === col("xmo"))
      .where(col("rn") > col("k") && col("v") > col("mx"))
      .groupBy(col("mo")).agg(min(col("rn")).as("prn"))
    val pick = km
      .join(broadcast(cand.withColumnRenamed("mo", "cmo")),
        col("mo") === col("cmo"), "left")
      .join(rk.select(col("mo").as("pmo"), col("rn").as("prn2"),
        col("v").as("pv")),
        col("cmo") === col("pmo") && col("prn") === col("prn2"), "left")
      .select(col("mo"), col("best"),
        coalesce(col("pv"), lit(-1)).as("picked"))
    pick.agg(count(lit(1)).as("n_months"),
        count(when(col("picked") === col("best"), 1)).as("n_best"),
        count(when(col("picked") < 0, 1)).as("n_no_pick"))
      .select(col("n_months"), col("n_best"), col("n_no_pick"),
        expr("(1000 * n_best) div n_months").as("best_rate_permille"))
  }

  /** np control chart for the DAILY count of returned lines at fixed
    * subgroup size: for days with exactly the modal line count n₀
    * (the chart's constant-n contract, selected not assumed), flag
    * days outside np̄ ± 3√(np̄(1−p̄)). The attribute-chart member the
    * X̄-R/I-MR family (q532/q585) doesn't cover. */
  def q638: Q = Q(
    "q638_np_chart",
    Some("""
      |WITH d AS (
      |  SELECT epoch_us(l_shipdate) // 86400000000 AS day,
      |         count(*) AS n,
      |         sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS np
      |  FROM lineitem GROUP BY 1),
      |n0 AS (SELECT n AS n0 FROM (
      |         SELECT n, count(*) AS c FROM d GROUP BY 1
      |         ORDER BY c DESC, n LIMIT 1)),
      |sub AS (SELECT d.* FROM d CROSS JOIN n0 WHERE d.n = n0.n0),
      |pb AS (SELECT CAST(sum(np) AS DOUBLE) / sum(n) AS pbar,
      |              count(*) AS k FROM sub),
      |lim AS (
      |  SELECT n0.n0 * pb.pbar
      |           - 3.0 * sqrt(n0.n0 * pb.pbar * (1.0 - pb.pbar)) AS lcl,
      |         n0.n0 * pb.pbar
      |           + 3.0 * sqrt(n0.n0 * pb.pbar * (1.0 - pb.pbar)) AS ucl,
      |         pb.k, n0.n0
      |  FROM pb CROSS JOIN n0)
      |SELECT CAST(lim.n0 AS BIGINT) AS subgroup_size,
      |       CAST(lim.k AS BIGINT) AS n_subgroup_days,
      |       CAST(floor(lim.lcl * 1000.0) AS BIGINT) AS lcl_milli,
      |       CAST(floor(lim.ucl * 1000.0) AS BIGINT) AS ucl_milli,
      |       CAST((SELECT count(*) FROM sub CROSS JOIN lim
      |             WHERE CAST(np AS DOUBLE) < lim.lcl
      |                OR CAST(np AS DOUBLE) > lim.ucl) AS BIGINT)
      |         AS n_violations
      |FROM lim
      |""".stripMargin)) { (s, dir) =>
    val d = Tables.lineitem(s, dir)
      .groupBy(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))" +
        " div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("np"))
      .materialize() // the modal-n pick AND the subgroup read it
    val n0 = d.groupBy(col("n")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("n")).limit(1)
      .select(col("n").as("n0"))
    val sub = d.crossJoin(broadcast(n0)).where(col("n") === col("n0"))
      .materialize()
    val pb = sub.agg(expr("CAST(sum(np) AS DOUBLE) / sum(n)").as("pbar"),
      count(lit(1)).as("k"))
    val lim = pb.crossJoin(broadcast(n0))
      .select(col("n0"), col("k"),
        expr("n0 * pbar - 3.0 * sqrt(n0 * pbar * (1.0 - pbar))")
          .as("lcl"),
        expr("n0 * pbar + 3.0 * sqrt(n0 * pbar * (1.0 - pbar))")
          .as("ucl"))
    val viol = sub.crossJoin(broadcast(lim))
      .where(col("np").cast("double") < col("lcl") ||
        col("np").cast("double") > col("ucl"))
      .agg(count(lit(1)).as("n_violations"))
    lim.crossJoin(broadcast(viol))
      .select(col("n0").as("subgroup_size"),
        col("k").as("n_subgroup_days"),
        expr("CAST(floor(lcl * 1000.0) AS BIGINT)").as("lcl_milli"),
        expr("CAST(floor(ucl * 1000.0) AS BIGINT)").as("ucl_milli"),
        col("n_violations"))
  }

  /** Blomqvist's β (quadrant dependence) of line price vs quantity:
    * sign agreement relative to the two EXACT medians —
    * β = (n_agree − n_disagree)/(n_agree + n_disagree), points on a
    * median dropped. The five-minute dependence check that is immune
    * to every monotone transformation and most outliers. */
  def q639: Q = Q(
    "q639_blomqvist_beta",
    Some("""
      |WITH l AS (
      |  SELECT CAST(floor(l_extendedprice) AS BIGINT) AS x,
      |         CAST(floor(l_quantity + 0.5) AS BIGINT) AS y
      |  FROM lineitem),
      |mx AS (
      |  SELECT max(CASE WHEN rn = (500 * n + 999) // 1000 THEN x END)
      |           AS mx
      |  FROM (SELECT x, row_number() OVER (ORDER BY x) AS rn,
      |               count(*) OVER () AS n FROM l) r),
      |my AS (
      |  SELECT max(CASE WHEN rn = (500 * n + 999) // 1000 THEN y END)
      |           AS my
      |  FROM (SELECT y, row_number() OVER (ORDER BY y) AS rn,
      |               count(*) OVER () AS n FROM l) r),
      |q AS (
      |  SELECT count(*) FILTER ((x > mx.mx AND y > my.my)
      |           OR (x < mx.mx AND y < my.my)) AS agree,
      |         count(*) FILTER ((x > mx.mx AND y < my.my)
      |           OR (x < mx.mx AND y > my.my)) AS disagree
      |  FROM l CROSS JOIN mx CROSS JOIN my)
      |SELECT CAST(agree AS BIGINT) AS n_agree,
      |       CAST(disagree AS BIGINT) AS n_disagree,
      |       CAST(floor(CAST(agree - disagree AS DOUBLE)
      |         / CAST(agree + disagree AS DOUBLE) * 1000000.0) AS BIGINT)
      |         AS beta_micro
      |FROM q
      |""".stripMargin)) { (s, dir) =>
    val l = Tables.lineitem(s, dir).select(
        expr("CAST(floor(l_extendedprice) AS BIGINT)").as("x"),
        expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("y"))
      .materialize() // two medians AND the quadrant count read it
    def med(c: String) = graft.operators.OrderStats.quantilesDisc(
        l.withColumn("k", lit(0L)), Seq("k"), c, Seq(500))
      .select(col("value").as(s"m$c"))
    l.crossJoin(broadcast(med("x"))).crossJoin(broadcast(med("y")))
      .agg(count(when((col("x") > col("mx") && col("y") > col("my")) ||
        (col("x") < col("mx") && col("y") < col("my")), 1)).as("agree"),
        count(when((col("x") > col("mx") && col("y") < col("my")) ||
          (col("x") < col("mx") && col("y") > col("my")), 1))
          .as("disagree"))
      .select(col("agree").as("n_agree"), col("disagree").as("n_disagree"),
        expr("CAST(floor(CAST(agree - disagree AS DOUBLE)" +
          " / CAST(agree + disagree AS DOUBLE) * 1000000.0) AS BIGINT)")
          .as("beta_micro"))
  }

  /** Turning-point test of the daily net series: count strict local
    * extrema among interior days (lag/lead over the calendar-bounded
    * day dim) against the i.i.d. expectation 2(n−2)/3 with
    * Var = (16n−29)/90 — "is there serial structure at all"
    * before fitting anything autoregressive. */
  def q640: Q = Q(
    "q640_turning_points",
    Some(s"""
      |WITH ${DailyNet.sql.stripPrefix("\n")},
      |w AS (
      |  SELECT net,
      |         lag(net) OVER (ORDER BY day) AS prev,
      |         lead(net) OVER (ORDER BY day) AS nxt
      |  FROM d),
      |tp AS (
      |  SELECT count(*) AS n_turn
      |  FROM w WHERE prev IS NOT NULL AND nxt IS NOT NULL
      |    AND ((net > prev AND net > nxt) OR (net < prev AND net < nxt))),
      |nn AS (SELECT count(*) AS n FROM d)
      |SELECT CAST(nn.n AS BIGINT) AS n_days,
      |       CAST(tp.n_turn AS BIGINT) AS n_turning_points,
      |       CAST(floor(2.0 * (nn.n - 2) / 3.0 * 1000.0) AS BIGINT)
      |         AS expected_milli,
      |       CAST(floor((CAST(tp.n_turn AS DOUBLE)
      |           - 2.0 * (nn.n - 2) / 3.0)
      |           * (CAST(tp.n_turn AS DOUBLE) - 2.0 * (nn.n - 2) / 3.0)
      |         / ((16.0 * nn.n - 29.0) / 90.0) * 1000.0) AS BIGINT)
      |         AS z2_milli
      |FROM tp CROSS JOIN nn
      |""".stripMargin)) { (s, dir) =>
    val d = DailyNet.frame(s, dir).materialize()
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
    val tp = d
      .withColumn("prev", lag(col("net"), 1).over(w))
      .withColumn("nxt", lead(col("net"), 1).over(w))
      .where(col("prev").isNotNull && col("nxt").isNotNull &&
        ((col("net") > col("prev") && col("net") > col("nxt")) ||
          (col("net") < col("prev") && col("net") < col("nxt"))))
      .agg(count(lit(1)).as("n_turn"))
    val nn = d.agg(count(lit(1)).as("n"))
    tp.crossJoin(broadcast(nn))
      .select(col("n").as("n_days"), col("n_turn").as("n_turning_points"),
        expr("CAST(floor(2.0 * (n - 2) / 3.0 * 1000.0) AS BIGINT)")
          .as("expected_milli"),
        expr("CAST(floor((CAST(n_turn AS DOUBLE) - 2.0 * (n - 2) / 3.0)" +
          " * (CAST(n_turn AS DOUBLE) - 2.0 * (n - 2) / 3.0)" +
          " / ((16.0 * n - 29.0) / 90.0) * 1000.0) AS BIGINT)")
          .as("z2_milli"))
  }
}
