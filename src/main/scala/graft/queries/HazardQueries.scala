package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-8 hazard/decomposition wave: Nelson–Aalen cumulative hazard,
  * Aalen–Johansen cumulative incidence under competing causes (both on
  * the q587 lead-time frame with its deterministic censoring), an
  * Oaxaca–Blinder decomposition of the region return-rate gap over
  * brand mix, the Ellison–Glaeser geographic-concentration index per
  * brand, and the M/G/1 Pollaczek–Khinchine waiting time from exact
  * service moments. Hazard cumulatives ride the calendar-bounded
  * day/interval dims. */
object HazardQueries {

  val all: Seq[Q] = Seq(q616, q617, q618, q619, q620)

  /** Lead-time observation frame shared with q587: positive first-ship
    * lead t, deterministic censor C = 30 + 17·(id mod 100), observed
    * y = min(t, C), event e = t ≤ C, cause = hi/lo order priority. */
  private def obsSql: String = """
    |lead AS (
    |  SELECT o.o_orderkey AS id,
    |         epoch_us(min(l.l_shipdate)) // 86400000000
    |           - epoch_us(any_value(o.o_orderdate)) // 86400000000 AS t,
    |         CASE WHEN any_value(o.o_orderpriority)
    |                IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 2 END AS cause
    |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    |  GROUP BY 1),
    |pos AS (SELECT * FROM lead WHERE t >= 1),
    |obs AS (
    |  SELECT least(t, 30 + 17 * (id % 100)) AS y,
    |         CASE WHEN t <= 30 + 17 * (id % 100) THEN 1 ELSE 0 END AS e,
    |         cause
    |  FROM pos)""".stripMargin

  private def obsBase(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey").as("id"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))" +
          " div 86400000000").as("od"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(2L).as("cause"))
      .join(Tables.lineitem(s, dir).select(col("l_orderkey"),
        expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))" +
          " div 86400000000").as("sd")),
        col("id") === col("l_orderkey"))
      .groupBy(col("id"), col("od"), col("cause"))
      .agg(min(col("sd")).as("fs"))
      .select(col("id"), (col("fs") - col("od")).as("t"), col("cause"))
      .where(col("t") >= 1)
      .select(least(col("t"), expr("30 + 17 * (id % 100)")).as("y"),
        when(col("t") <= expr("30 + 17 * (id % 100)"), 1L).otherwise(0L)
          .as("e"),
        col("cause"))

  /** Nelson–Aalen cumulative hazard Ĥ(t) = Σ_{s≤t} d_s/r_s under the
    * deterministic censoring: at-risk r from a suffix sum over the
    * calendar-bounded day dim, per-day increments micro-quantized by
    * integer floor division (all positive), then one exact cumulative
    * sum. Reported at event days. The estimator that stays stable
    * where Kaplan–Meier's product form loses precision. */
  def q616: Q = Q(
    "q616_nelson_aalen",
    Some(s"""
      |WITH ${obsSql},
      |day AS (
      |  SELECT y AS day, sum(e) AS d, count(*) AS c
      |  FROM obs GROUP BY 1),
      |rs AS (
      |  SELECT day, d,
      |         sum(c) OVER (ORDER BY day ROWS BETWEEN CURRENT ROW AND
      |           UNBOUNDED FOLLOWING) AS r
      |  FROM day),
      |hz AS (
      |  SELECT day, d, r, (1000000 * d) // r AS inc,
      |         sum((1000000 * d) // r) OVER (ORDER BY day) AS h_micro,
      |         sum(d) OVER (ORDER BY day) AS d_cum
      |  FROM rs)
      |SELECT CAST(day AS BIGINT) AS day, CAST(d AS BIGINT) AS n_events,
      |       CAST(r AS BIGINT) AS n_at_risk,
      |       CAST(d_cum AS BIGINT) AS events_cum,
      |       CAST(h_micro AS BIGINT) AS h_micro
      |FROM hz WHERE d > 0 ORDER BY day
      |""".stripMargin)) { (s, dir) =>
    val day = obsBase(s, dir)
      .groupBy(col("y").as("day"))
      .agg(sum(col("e")).as("d"), count(lit(1)).as("c"))
    val wSuf = Window.orderBy(col("day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wCum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    day
      .withColumn("r", sum(col("c")).over(wSuf))
      .withColumn("inc", expr("(1000000 * d) div r"))
      .withColumn("h_micro", sum(col("inc")).over(wCum))
      .withColumn("d_cum", sum(col("d")).over(wCum))
      .where(col("d") > 0)
      .select(col("day"), col("d").as("n_events"),
        col("r").as("n_at_risk"), col("d_cum").as("events_cum"),
        col("h_micro"))
      .orderBy(col("day"))
  }

  /** Aalen–Johansen cumulative incidence of the two competing causes
    * (hi- vs lo-priority shipping) on the 90-day actuarial intervals:
    * all-cause survival S folds as the q587 integer floor-product, and
    * each cause's CIF accumulates S·q_c per interval — the
    * probability-of-this-event-first curve a cause-specific KM
    * overstates. Identical integer recurrence in both engines. */
  def q617: Q = Q(
    "q617_cumulative_incidence",
    Some(s"""
      |WITH ${obsSql},
      |iv AS (
      |  SELECT y // 90 AS iv,
      |         count(*) FILTER (e = 1 AND cause = 1) AS d1,
      |         count(*) FILTER (e = 1 AND cause = 2) AS d2,
      |         count(*) FILTER (e = 0) AS w
      |  FROM obs GROUP BY 1),
      |en AS (
      |  SELECT iv, d1, d2, w,
      |         sum(d1 + d2 + w) OVER (ORDER BY iv ROWS BETWEEN CURRENT ROW
      |           AND UNBOUNDED FOLLOWING) AS n
      |  FROM iv),
      |ql AS (
      |  SELECT list({'s': CAST(0 AS BIGINT), 'c1': CAST(0 AS BIGINT),
      |               'c2': CAST(0 AS BIGINT), 'q1': q1, 'q2': q2}
      |              ORDER BY iv) AS qs,
      |         list(iv ORDER BY iv) AS ivl,
      |         list(n ORDER BY iv) AS nl
      |  FROM (SELECT iv, n,
      |               (2000000 * d1) // (2 * n - w) AS q1,
      |               (2000000 * d2) // (2 * n - w) AS q2
      |        FROM en) t),
      |ex AS (
      |  SELECT unnest(ivl) AS iv, unnest(nl) AS n_enter,
      |         unnest(list_transform(range(1, len(qs) + 1),
      |           i -> list_reduce(
      |             list_prepend({'s': CAST(1000000 AS BIGINT),
      |                           'c1': CAST(0 AS BIGINT),
      |                           'c2': CAST(0 AS BIGINT),
      |                           'q1': CAST(0 AS BIGINT),
      |                           'q2': CAST(0 AS BIGINT)},
      |               list_slice(qs, 1, i)),
      |             (a, e) -> {
      |               's': (a.s * (1000000 - e.q1 - e.q2)) // 1000000,
      |               'c1': a.c1 + (a.s * e.q1) // 1000000,
      |               'c2': a.c2 + (a.s * e.q2) // 1000000,
      |               'q1': CAST(0 AS BIGINT), 'q2': CAST(0 AS BIGINT)})))
      |           AS st
      |  FROM ql)
      |SELECT CAST(90 * iv AS BIGINT) AS day_lo,
      |       CAST(n_enter AS BIGINT) AS n_enter,
      |       CAST(st.s AS BIGINT) AS surv_micro,
      |       CAST(st.c1 AS BIGINT) AS cif_hi_micro,
      |       CAST(st.c2 AS BIGINT) AS cif_lo_micro
      |FROM ex ORDER BY day_lo
      |""".stripMargin)) { (s, dir) =>
    val iv = obsBase(s, dir)
      .groupBy(expr("y div 90").as("iv"))
      .agg(count(when(col("e") === 1 && col("cause") === 1, 1)).as("d1"),
        count(when(col("e") === 1 && col("cause") === 2, 1)).as("d2"),
        count(when(col("e") === 0, 1)).as("w"))
    val wSuf = Window.orderBy(col("iv"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val qq = iv
      .withColumn("n", sum(col("d1") + col("d2") + col("w")).over(wSuf))
      .withColumn("q1", expr("(2000000 * d1) div (2 * n - w)"))
      .withColumn("q2", expr("(2000000 * d2) div (2 * n - w)"))
    qq.agg(sort_array(collect_list(struct(col("iv"), col("n"), col("q1"),
        col("q2")))).as("rs"))
      .select(explode(expr(
        """transform(rs, (r, i) -> named_struct(
          |  'day_lo', CAST(90 * r.iv AS BIGINT), 'n_enter', r.n,
          |  'st', aggregate(slice(rs, 1, i + 1),
          |    named_struct('s', CAST(1000000 AS BIGINT),
          |      'c1', CAST(0 AS BIGINT), 'c2', CAST(0 AS BIGINT)),
          |    (a, e) -> named_struct(
          |      's', (a.s * (1000000 - e.q1 - e.q2)) div 1000000,
          |      'c1', a.c1 + (a.s * e.q1) div 1000000,
          |      'c2', a.c2 + (a.s * e.q2) div 1000000))))"""
          .stripMargin)).as("r"))
      .select(col("r.day_lo").as("day_lo"), col("r.n_enter").as("n_enter"),
        col("r.st.s").as("surv_micro"), col("r.st.c1").as("cif_hi_micro"),
        col("r.st.c2").as("cif_lo_micro"))
      .orderBy(col("day_lo"))
  }

  /** Oaxaca–Blinder decomposition of the return-rate gap between
    * region-0 customers (group A) and everyone else (B), over the
    * brand mix: gap = Σ_k (w_Ak − w_Bk)·r_Bk [composition] +
    * Σ_k w_Ak·(r_Ak − r_Bk) [rate]. Per-brand terms are exact
    * rationals micro-quantized through ONE shared pinned expression,
    * then summed exactly — the "is the gap mix or behavior"
    * decomposition, audit-closed by construction up to quantization. */
  def q618: Q = {
    def term(num: String) =
      s"CAST(floor($num * 1000000.0) AS BIGINT)"
    Q("q618_oaxaca_blinder",
      Some(s"""
        |WITH lb AS (
        |  SELECT p.p_brand AS brand,
        |         CASE WHEN n.n_regionkey = 0 THEN 'a' ELSE 'b' END AS grp,
        |         count(*) AS n,
        |         sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
        |           AS r
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY 1, 2),
        |tt AS (
        |  SELECT sum(CASE WHEN grp = 'a' THEN n ELSE 0 END) AS na,
        |         sum(CASE WHEN grp = 'a' THEN r ELSE 0 END) AS ra,
        |         sum(CASE WHEN grp = 'b' THEN n ELSE 0 END) AS nb,
        |         sum(CASE WHEN grp = 'b' THEN r ELSE 0 END) AS rb
        |  FROM lb),
        |bk AS (
        |  SELECT brand,
        |         sum(CASE WHEN grp = 'a' THEN n ELSE 0 END) AS nak,
        |         sum(CASE WHEN grp = 'a' THEN r ELSE 0 END) AS rak,
        |         sum(CASE WHEN grp = 'b' THEN n ELSE 0 END) AS nbk,
        |         sum(CASE WHEN grp = 'b' THEN r ELSE 0 END) AS rbk
        |  FROM lb GROUP BY 1),
        |terms AS (
        |  SELECT
        |    ${term("(CAST(nak AS DOUBLE) / tt.na" +
          " - CAST(nbk AS DOUBLE) / tt.nb)" +
          " * (CASE WHEN nbk > 0 THEN CAST(rbk AS DOUBLE) / nbk" +
          " ELSE 0.0 END)")} AS comp_micro,
        |    ${term("CAST(nak AS DOUBLE) / tt.na" +
          " * ((CASE WHEN nak > 0 THEN CAST(rak AS DOUBLE) / nak" +
          " ELSE 0.0 END)" +
          " - (CASE WHEN nbk > 0 THEN CAST(rbk AS DOUBLE) / nbk" +
          " ELSE 0.0 END))")} AS rate_micro
        |  FROM bk CROSS JOIN tt)
        |SELECT CAST((1000000 * tt.ra) // tt.na AS BIGINT) AS rate_a_ppm,
        |       CAST((1000000 * tt.rb) // tt.nb AS BIGINT) AS rate_b_ppm,
        |       CAST((1000000 * tt.ra) // tt.na
        |         - (1000000 * tt.rb) // tt.nb AS BIGINT) AS gap_ppm,
        |       CAST(sum(comp_micro) AS BIGINT) AS composition_ppm,
        |       CAST(sum(rate_micro) AS BIGINT) AS rate_effect_ppm
        |FROM terms CROSS JOIN tt
        |GROUP BY tt.ra, tt.na, tt.rb, tt.nb
        |""".stripMargin)) { (s, dir) =>
      val lb = Tables.lineitem(s, dir)
        .join(Tables.part(s, dir)
          .select(col("p_partkey"), col("p_brand").as("brand")),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(s, dir)
          .select(col("n_nationkey"), col("n_regionkey")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("brand"),
          when(col("n_regionkey") === 0, "a").otherwise("b").as("grp"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .as("r"))
        .materialize() // brand×group dim feeds totals AND terms
      val tt = lb.agg(
        sum(when(col("grp") === "a", col("n")).otherwise(0L)).as("na"),
        sum(when(col("grp") === "a", col("r")).otherwise(0L)).as("ra"),
        sum(when(col("grp") === "b", col("n")).otherwise(0L)).as("nb"),
        sum(when(col("grp") === "b", col("r")).otherwise(0L)).as("rb"))
      val bk = lb.groupBy(col("brand"))
        .agg(sum(when(col("grp") === "a", col("n")).otherwise(0L))
          .as("nak"),
          sum(when(col("grp") === "a", col("r")).otherwise(0L)).as("rak"),
          sum(when(col("grp") === "b", col("n")).otherwise(0L)).as("nbk"),
          sum(when(col("grp") === "b", col("r")).otherwise(0L)).as("rbk"))
      val terms = bk.crossJoin(broadcast(tt))
        .select(
          expr("CAST(floor((CAST(nak AS DOUBLE) / na" +
            " - CAST(nbk AS DOUBLE) / nb)" +
            " * (CASE WHEN nbk > 0 THEN CAST(rbk AS DOUBLE) / nbk" +
            " ELSE 0.0 END) * 1000000.0) AS BIGINT)").as("comp_micro"),
          expr("CAST(floor(CAST(nak AS DOUBLE) / na" +
            " * ((CASE WHEN nak > 0 THEN CAST(rak AS DOUBLE) / nak" +
            " ELSE 0.0 END)" +
            " - (CASE WHEN nbk > 0 THEN CAST(rbk AS DOUBLE) / nbk" +
            " ELSE 0.0 END)) * 1000000.0) AS BIGINT)").as("rate_micro"))
      terms.agg(sum(col("comp_micro")).as("composition_ppm"),
          sum(col("rate_micro")).as("rate_effect_ppm"))
        .crossJoin(broadcast(tt))
        .select(expr("CAST((1000000 * ra) div na AS BIGINT)")
          .as("rate_a_ppm"),
          expr("CAST((1000000 * rb) div nb AS BIGINT)").as("rate_b_ppm"),
          expr("CAST((1000000 * ra) div na - (1000000 * rb) div nb" +
            " AS BIGINT)").as("gap_ppm"),
          col("composition_ppm"), col("rate_effect_ppm"))
    }
  }

  /** Ellison–Glaeser geographic concentration γ per brand over
    * supplier nations: raw concentration G = Σ_r (s_r − x_r)² against
    * the aggregate nation shares x, discounted by the brand's
    * supplier-level Herfindahl H — "more clustered than its plant
    * structure forces". Shares are pinned doubles from exact counts;
    * 25 brands × 25 nations stays dim-sized forever. */
  def q619: Q = {
    val gExpr = "sum((CAST(q AS DOUBLE) / qb - CAST(xr AS DOUBLE) / xt)" +
      " * (CAST(q AS DOUBLE) / qb - CAST(xr AS DOUBLE) / xt))"
    Q("q619_ellison_glaeser",
      Some(s"""
        |WITH l AS (
        |  SELECT p.p_brand AS brand, s.s_nationkey AS nk,
        |         l.l_suppkey AS sk,
        |         CAST(floor(l.l_quantity + 0.5) AS BIGINT) AS q
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey),
        |bn AS (SELECT brand, nk, sum(q) AS q FROM l GROUP BY 1, 2),
        |bq AS (SELECT brand, sum(q) AS qb FROM bn GROUP BY 1),
        |xn AS (SELECT nk, sum(q) AS xr FROM bn GROUP BY 1),
        |xta AS (SELECT sum(q) AS xt FROM bn),
        |xx AS (SELECT sum(CAST(xr AS DOUBLE) / xta.xt
        |                  * (CAST(xr AS DOUBLE) / xta.xt)) AS x2
        |       FROM xn CROSS JOIN xta),
        |hh AS (
        |  SELECT brand, sum(CAST(sq AS DOUBLE) / qb
        |                    * (CAST(sq AS DOUBLE) / qb)) AS h
        |  FROM (SELECT brand, sk, sum(q) AS sq FROM l GROUP BY 1, 2) t
        |  JOIN bq USING (brand) GROUP BY 1),
        |gg AS (
        |  SELECT bn.brand, $gExpr AS g
        |  FROM bn JOIN bq USING (brand)
        |  CROSS JOIN xta
        |  JOIN xn ON bn.nk = xn.nk
        |  GROUP BY 1)
        |SELECT gg.brand,
        |       CAST(floor(gg.g * 1000000.0) AS BIGINT) AS g_micro,
        |       CAST(floor(hh.h * 1000000.0) AS BIGINT) AS h_micro,
        |       CAST(floor((gg.g - (1.0 - xx.x2) * hh.h)
        |         / ((1.0 - xx.x2) * (1.0 - hh.h)) * 1000000.0) AS BIGINT)
        |         AS gamma_micro
        |FROM gg JOIN hh ON gg.brand = hh.brand CROSS JOIN xx
        |ORDER BY gg.brand
        |""".stripMargin)) { (s, dir) =>
      val l = Tables.lineitem(s, dir)
        .join(Tables.part(s, dir)
          .select(col("p_partkey"), col("p_brand").as("brand")),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.supplier(s, dir)
          .select(col("s_suppkey"), col("s_nationkey").as("nk")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("brand"), col("nk"), col("l_suppkey").as("sk"),
          expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("q"))
        .materialize() // one fact pass feeds brand×nation AND brand×supp
      val bn = l.groupBy(col("brand"), col("nk"))
        .agg(sum(col("q")).as("q")).materialize()
      val bq = bn.groupBy(col("brand")).agg(sum(col("q")).as("qb"))
      val xn = bn.groupBy(col("nk")).agg(sum(col("q")).as("xr"))
      val xt = bn.agg(sum(col("q")).as("xt"))
      val xx = xn.crossJoin(broadcast(xt))
        .agg(sum(expr("CAST(xr AS DOUBLE) / xt" +
          " * (CAST(xr AS DOUBLE) / xt)")).as("x2"))
      val hh = l.groupBy(col("brand"), col("sk"))
        .agg(sum(col("q")).as("sq"))
        .join(broadcast(bq), "brand")
        .groupBy(col("brand"))
        .agg(sum(expr("CAST(sq AS DOUBLE) / qb" +
          " * (CAST(sq AS DOUBLE) / qb)")).as("h"))
      val gg = bn.join(broadcast(bq), "brand")
        .crossJoin(broadcast(xt))
        .join(broadcast(xn), "nk")
        .groupBy(col("brand"))
        .agg(expr(gExpr).as("g"))
      gg.join(hh.withColumnRenamed("brand", "hbrand"),
          col("brand") === col("hbrand"))
        .crossJoin(broadcast(xx))
        .select(col("brand"),
          expr("CAST(floor(g * 1000000.0) AS BIGINT)").as("g_micro"),
          expr("CAST(floor(h * 1000000.0) AS BIGINT)").as("h_micro"),
          expr("CAST(floor((g - (1.0 - x2) * h)" +
            " / ((1.0 - x2) * (1.0 - h)) * 1000000.0) AS BIGINT)")
            .as("gamma_micro"))
        .orderBy(col("brand"))
    }
  }

  /** M/G/1 Pollaczek–Khinchine mean queue wait for the purchase
    * "service desk": arrivals = purchase events over the observed span,
    * service time = the event value in seconds — λ and the first two
    * service moments are exact integer sums, ρ = λE[S] and
    * W_q = λE[S²]/(2(1−ρ)) two pinned-double expressions. The
    * second-moment sensitivity (variance hurts the queue even at the
    * same mean) is the whole point of P–K over M/M/1. */
  def q620: Q = {
    val lam = "CAST(n AS DOUBLE) / (CAST(span_us AS DOUBLE) / 1000000.0)"
    val es = "CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) / 100.0"
    val es2 = "CAST(q2 AS DOUBLE) / CAST(n AS DOUBLE) / 10000.0"
    Q("q620_mg1_pollaczek",
      Some(s"""
        |WITH p AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
        |         CAST(value * 100 AS BIGINT) AS v
        |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
        |mo AS (
        |  SELECT count(*) AS n, max(tus) - min(tus) AS span_us,
        |         sum(v) AS sv, sum(CAST(v AS HUGEINT) * v) AS q2
        |  FROM p)
        |SELECT CAST(n AS BIGINT) AS n_arrivals,
        |       CAST(span_us // 1000000 AS BIGINT) AS span_seconds,
        |       CAST(floor($lam * 1000000.0) AS BIGINT) AS lambda_micro,
        |       CAST(floor($lam * ($es) * 1000.0) AS BIGINT) AS rho_milli,
        |       CAST(floor($lam * ($es2)
        |         / (2.0 * (1.0 - $lam * ($es))) * 1000.0) AS BIGINT)
        |         AS wq_milli_seconds
        |FROM mo
        |""".stripMargin)) { (s, dir) =>
      val p = Tables.events(s, dir)
        .where(col("event_type") === "purchase" && col("value").isNotNull)
        .select(expr("ts div 1000").as("tus"),
          expr("CAST(value * 100 AS DECIMAL(38,0))").as("v"))
      p.agg(count(lit(1)).as("n"),
          (max(col("tus")) - min(col("tus"))).as("span_us"),
          sum(col("v")).as("sv"),
          sum(col("v") * col("v")).as("q2"))
        .select(col("n").as("n_arrivals"),
          expr("CAST(span_us div 1000000 AS BIGINT)").as("span_seconds"),
          expr(s"CAST(floor($lam * 1000000.0) AS BIGINT)")
            .as("lambda_micro"),
          expr(s"CAST(floor($lam * ($es) * 1000.0) AS BIGINT)")
            .as("rho_milli"),
          expr(s"CAST(floor($lam * ($es2)" +
            s" / (2.0 * (1.0 - $lam * ($es))) * 1000.0) AS BIGINT)")
            .as("wq_milli_seconds"))
    }
  }
}
