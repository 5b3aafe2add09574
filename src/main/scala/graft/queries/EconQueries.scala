package graft.queries

import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-7 econometrics wave: Bass diffusion (quadratic OLS via
  * Cramer determinants), brand substitution structure, lead-lag
  * cross-correlation, the ABC-XYZ inventory matrix, and a two-way
  * fixed-effects elasticity — the "model the business" faces. The
  * discipline throughout: exact integer moments, then ONE double
  * fragment (Scala-built, inlined verbatim into both the oracle SQL
  * and the Spark expr) for anything past a ratio.
  */
object EconQueries {

  val all: Seq[Q] = Seq(q401, q402, q403, q404, q405, q406, q407, q408,
    q409, q410)

  private[queries] def dbl(x: String) = s"CAST($x AS DOUBLE)"

  /** 3×3 determinant expanded along the first row — ONE definition so
    * the four Cramer matrices in q401 cannot disagree on op order. */
  private[queries] def det3(m11: String, m12: String, m13: String,
      m21: String, m22: String, m23: String,
      m31: String, m32: String, m33: String): String =
    s"($m11 * ($m22 * $m33 - $m23 * $m32)" +
      s" - $m12 * ($m21 * $m33 - $m23 * $m31)" +
      s" + $m13 * ($m21 * $m32 - $m22 * $m31))"

  /** Bass diffusion fit of monthly customer adoption: quadratic OLS
    * n_t = a + b·N + c·N² on cumulative prior adopters N (normal
    * equations solved by Cramer's rule — det3 fragments shared by
    * both engines), then the Bass parameters M (market size, root of
    * cM² + bM + a = 0), p = a/M, q = −c·M. Moment sums Σx⁰..⁴, Σy,
    * Σxy, Σx²y are exact integers; degenerate determinant /
    * negative discriminant yield NULL in both engines. */
  def q401: Q = {
    val n = dbl("n"); val s1 = dbl("s1"); val s2 = dbl("s2")
    val s3 = dbl("s3"); val s4 = dbl("s4")
    val t0 = dbl("t0"); val t1 = dbl("t1"); val t2 = dbl("t2")
    val dd = det3(n, s1, s2, s1, s2, s3, s2, s3, s4)
    val aaN = det3(t0, s1, s2, t1, s2, s3, t2, s3, s4)
    val bbN = det3(n, t0, s2, s1, t1, s3, s2, t2, s4)
    val ccN = det3(n, s1, t0, s1, s2, t1, s2, s3, t2)
    def over(num: String) = s"CASE WHEN ($dd) <> 0.0 THEN ($num) / ($dd) END"
    val mh = "CASE WHEN cc IS NOT NULL AND cc <> 0.0" +
      " AND bb * bb - 4.0 * cc * aa >= 0.0" +
      " THEN (0.0 - bb - sqrt(bb * bb - 4.0 * cc * aa)) / (2.0 * cc) END"
    def qm(x: String, scale: String) =
      s"CAST(floor(CAST(($x) * $scale AS DECIMAL(28,6))) AS BIGINT)"
    Q("q401_bass_diffusion",
      Some(s"""
        |WITH f AS (
        |  SELECT o_custkey,
        |         CAST(min(year(o_orderdate) * 12 + month(o_orderdate))
        |              AS BIGINT) AS ym
        |  FROM orders GROUP BY 1),
        |m AS (SELECT ym, CAST(count(*) AS BIGINT) AS y FROM f GROUP BY 1),
        |c AS (
        |  SELECT ym, y, CAST(coalesce(sum(y) OVER (ORDER BY ym
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |         AS BIGINT) AS x
        |  FROM m),
        |mom AS (
        |  SELECT count(*) AS n,
        |         sum(CAST(x AS HUGEINT)) AS s1,
        |         sum(CAST(x AS HUGEINT) * x) AS s2,
        |         sum(CAST(x AS HUGEINT) * x * x) AS s3,
        |         sum(CAST(x AS HUGEINT) * x * x * x) AS s4,
        |         sum(CAST(y AS HUGEINT)) AS t0,
        |         sum(CAST(x AS HUGEINT) * y) AS t1,
        |         sum(CAST(x AS HUGEINT) * x * y) AS t2
        |  FROM c),
        |co AS (
        |  SELECT n, t0, ${over(aaN)} AS aa, ${over(bbN)} AS bb,
        |         ${over(ccN)} AS cc
        |  FROM mom),
        |fit AS (SELECT n, t0, aa, bb, cc, $mh AS mh FROM co)
        |SELECT CAST(n AS BIGINT) AS n_months,
        |       CAST(t0 AS BIGINT) AS adopters,
        |       ${qm("aa", "1000000")} AS a_micro,
        |       ${qm("bb", "1000000")} AS b_micro,
        |       ${qm("cc", "1000000000")} AS c_nano,
        |       ${qm("mh", "1000")} AS m_hat_milli,
        |       ${qm("aa / mh", "1000000")} AS p_micro,
        |       ${qm("(0.0 - cc) * mh", "1000000")} AS q_micro
        |FROM fit
        |""".stripMargin)) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d38 = "decimal(38,0)"
      val m = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg((min(year(col("o_orderdate")) * 12
          + month(col("o_orderdate")))).cast("long").as("ym"))
        .groupBy(col("ym")).agg(count(lit(1)).as("y"))
      // month dim is calendar-bounded → the cumulative window is fine
      val c = m.withColumn("x",
        coalesce(sum(col("y")).over(Window.orderBy(col("ym"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val mom = c.agg(count(lit(1)).as("n"),
        sum(col("x").cast(d38)).cast(d38).as("s1"),
        sum(col("x").cast(d38) * col("x")).cast(d38).as("s2"),
        sum(col("x").cast(d38) * col("x") * col("x")).cast(d38).as("s3"),
        sum(col("x").cast(d38) * col("x") * col("x") * col("x"))
          .cast(d38).as("s4"),
        sum(col("y").cast(d38)).cast(d38).as("t0"),
        sum(col("x").cast(d38) * col("y")).cast(d38).as("t1"),
        sum(col("x").cast(d38) * col("x") * col("y")).cast(d38).as("t2"))
      mom
        .select(col("n"), col("t0"), expr(over(aaN)).as("aa"),
          expr(over(bbN)).as("bb"), expr(over(ccN)).as("cc"))
        .select(col("n"), col("t0"), col("aa"), col("bb"), col("cc"),
          expr(mh).as("mh"))
        .select(col("n").cast("long").as("n_months"),
          col("t0").cast("long").as("adopters"),
          expr(qm("aa", "1000000")).as("a_micro"),
          expr(qm("bb", "1000000")).as("b_micro"),
          expr(qm("cc", "1000000000")).as("c_nano"),
          expr(qm("mh", "1000")).as("m_hat_milli"),
          expr(qm("aa / mh", "1000000")).as("p_micro"),
          expr(qm("(0.0 - cc) * mh", "1000000")).as("q_micro"))
    }
  }

  /** Brand substitution structure: Pearson correlation of every brand
    * pair's daily shipped quantities (negative = substitutes, positive
    * = co-moving) — the full 300-pair matrix from one (brand, day)
    * dim self-joined on day, moments exact, the one guarded divide in
    * the shared sqlPearsonMilli fragment. */
  def q402: Q = Q(
    "q402_brand_substitution",
    Some(s"""
      |WITH bq AS (
      |  SELECT p.p_brand AS b, epoch_us(l.l_shipdate) // 86400000000 AS d,
      |         sum(CAST(l.l_quantity AS BIGINT)) AS q
      |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |  GROUP BY 1, 2),
      |pr AS (
      |  SELECT a.b AS b1, c.b AS b2, count(*) AS n,
      |         sum(a.q) AS sx, sum(c.q) AS sy,
      |         sum(a.q * c.q) AS sxy,
      |         sum(a.q * a.q) AS sxx, sum(c.q * c.q) AS syy
      |  FROM bq a JOIN bq c ON a.d = c.d AND a.b < c.b
      |  GROUP BY 1, 2)
      |SELECT b1, b2, CAST(n AS BIGINT) AS n_days,
      |       ${PipelineQueries.sqlPearsonMilli(
                 "n", "sx", "sy", "sxx", "syy", "sxy")} AS corr_milli
      |FROM pr ORDER BY b1, b2
      |""".stripMargin)) { (s, dir) =>
    val bq = Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)),
        col("p_partkey") === col("l_partkey"))
      .groupBy(col("p_brand").as("b"),
        expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) " +
          "div 86400000000").as("d"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
      .materialize() // brand-day dim feeds both legs of the pair join
    bq.join(bq.select(col("b").as("b2"), col("d").as("__d2"),
        col("q").as("__q2")),
      col("d") === col("__d2") && col("b") < col("b2"))
      .groupBy(col("b").as("b1"), col("b2"))
      .agg(count(lit(1)).as("n"),
        sum(col("q")).as("sx"), sum(col("__q2")).as("sy"),
        sum(col("q") * col("__q2")).as("sxy"),
        sum(col("q") * col("q")).as("sxx"),
        sum(col("__q2") * col("__q2")).as("syy"))
      .select(col("b1"), col("b2"), col("n").as("n_days"),
        expr(PipelineQueries.sqlPearsonMilli(
          "n", "sx", "sy", "sxx", "syy", "sxy")).as("corr_milli"))
      .orderBy(col("b1"), col("b2"))
  }

  /** Lead-lag cross-correlation between daily views and purchases:
    * corr(views_d, purchases_{d+k}) for k ∈ −3..3 — "does attention
    * lead conversion, and by how many days". One (type, day) count
    * dim, seven value-joins, exact moments, shared Pearson
    * fragment. */
  def q403: Q = Q(
    "q403_view_purchase_ccf",
    Some(s"""
      |WITH dc AS (
      |  SELECT event_type AS t, epoch_ns(ts) // 86400000000000 AS d,
      |         CAST(count(*) AS BIGINT) AS c
      |  FROM events WHERE event_type IN ('view', 'purchase')
      |  GROUP BY 1, 2),
      |lags AS (SELECT unnest(range(-3, 4)) AS lag),
      |pr AS (
      |  SELECT lags.lag, count(*) AS n,
      |         sum(v.c) AS sx, sum(p.c) AS sy,
      |         sum(v.c * p.c) AS sxy,
      |         sum(v.c * v.c) AS sxx, sum(p.c * p.c) AS syy
      |  FROM lags
      |  JOIN dc v ON v.t = 'view'
      |  JOIN dc p ON p.t = 'purchase' AND p.d = v.d + lags.lag
      |  GROUP BY 1)
      |SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_days,
      |       ${PipelineQueries.sqlPearsonMilli(
                 "n", "sx", "sy", "sxx", "syy", "sxy")} AS ccf_milli
      |FROM pr ORDER BY lag
      |""".stripMargin)) { (s, dir) =>
    val dc = Tables.events(s, dir)
      .where(col("event_type").isin("view", "purchase"))
      .groupBy(col("event_type").as("t"),
        expr("ts div 86400000000000").as("d"))
      .agg(count(lit(1)).as("c"))
      .materialize() // type-day dim feeds both series ×7 lags
    val lags = s.range(-3, 4).select(col("id").as("lag"))
    lags
      .crossJoin(dc.where(col("t") === "view")
        .select(col("d").as("__vd"), col("c").as("__vc")))
      .join(dc.where(col("t") === "purchase")
        .select(col("d").as("__pd"), col("c").as("__pc")),
        col("__pd") === col("__vd") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("__vc")).as("sx"), sum(col("__pc")).as("sy"),
        sum(col("__vc") * col("__pc")).as("sxy"),
        sum(col("__vc") * col("__vc")).as("sxx"),
        sum(col("__pc") * col("__pc")).as("syy"))
      .select(col("lag"), col("n").as("n_days"),
        expr(PipelineQueries.sqlPearsonMilli(
          "n", "sx", "sy", "sxx", "syy", "sxy")).as("ccf_milli"))
      .orderBy(col("lag"))
  }

  /** ABC-XYZ inventory matrix: parts classed by cumulative revenue
    * share (A ≤ 80%, B ≤ 95%, C rest — the cumulative walk rides
    * the bucket-parallel globalRankCum, never a single-partition
    * window over the catalog) × demand variability class from the
    * exact CV² cross-multiply over monthly quantities (X: CV ≤ 0.5,
    * Y: ≤ 1, Z rest). Output: the 9-cell (or fewer) matrix with part
    * counts and revenue share. */
  def q404: Q = Q(
    "q404_abc_xyz_matrix",
    Some("""
      |WITH rev AS (
      |  SELECT l_partkey AS part,
      |         sum(CAST(floor(CAST(l_extendedprice * (1.0 - l_discount)
      |              AS DECIMAL(18,9)) * 100) AS BIGINT)) AS cents
      |  FROM lineitem GROUP BY 1),
      |rv AS (SELECT part, cents FROM rev WHERE cents > 0),
      |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS tc FROM rv),
      |cum AS (
      |  SELECT part, cents,
      |         CAST(sum(cents) OVER (ORDER BY cents DESC, part)
      |              AS BIGINT) AS cum
      |  FROM rv),
      |abc AS (
      |  SELECT part, cents,
      |         CASE WHEN 1000 * cum <= 800 * tot.tc THEN 'A'
      |              WHEN 1000 * cum <= 950 * tot.tc THEN 'B'
      |              ELSE 'C' END AS abc
      |  FROM cum CROSS JOIN tot),
      |mq AS (
      |  SELECT l_partkey AS part,
      |         CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT)
      |           AS ym,
      |         sum(CAST(l_quantity AS BIGINT)) AS q
      |  FROM lineitem GROUP BY 1, 2),
      |xyz AS (
      |  SELECT part,
      |         CASE WHEN 4 * (count(*) * sum(q * q) - sum(q) * sum(q))
      |                   <= sum(q) * sum(q) THEN 'X'
      |              WHEN (count(*) * sum(q * q) - sum(q) * sum(q))
      |                   <= sum(q) * sum(q) THEN 'Y'
      |              ELSE 'Z' END AS xyz
      |  FROM mq GROUP BY 1)
      |SELECT abc.abc, xyz.xyz, CAST(count(*) AS BIGINT) AS n_parts,
      |       CAST(sum(abc.cents) AS BIGINT) AS revenue_cents,
      |       CAST((1000000 * CAST(sum(abc.cents) AS HUGEINT))
      |            // max(tot.tc) AS BIGINT) AS share_ppm
      |FROM abc JOIN xyz ON abc.part = xyz.part CROSS JOIN tot
      |GROUP BY 1, 2 ORDER BY abc, xyz
      |""".stripMargin)) { (s, dir) =>
    val rv = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey").as("part"))
      .agg(sum(floor((col("l_extendedprice")
          * (lit(1.0) - col("l_discount"))).cast("decimal(18,9)") * 100)
          .cast("long")).as("cents"))
      .where(col("cents") > 0)
      .materialize() // part-revenue dim feeds total AND the rank walk
    val tot = rv.agg(sum(col("cents")).as("tc"))
    // bucket-parallel descending cumulative: octave bucket + -cents tie
    val cum = graft.dedup.SortedNeighborhood.globalRankCum(
      rv.withColumn("__oct", -floor(log2(col("cents"))).cast("long"))
        .withColumn("__neg", -col("cents")),
      idCol = "part", bucketCol = "__oct", tieCols = Seq("__neg"),
      cumCol = Some("cents"))
    val abc = cum.crossJoin(broadcast(tot))
      .select(col("part"), col("cents"),
        when(lit(1000) * col("__cum") <= lit(800) * col("tc"), "A")
          .when(lit(1000) * col("__cum") <= lit(950) * col("tc"), "B")
          .otherwise("C").as("abc"))
    val xyz = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey").as("part"),
        (year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
          .cast("long").as("ym"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
      .groupBy(col("part"))
      .agg(count(lit(1)).as("nm"), sum(col("q")).as("sq"),
        sum(col("q") * col("q")).as("sqq"))
      .select(col("part"),
        when(lit(4) * (col("nm") * col("sqq") - col("sq") * col("sq"))
          <= col("sq") * col("sq"), "X")
          .when(col("nm") * col("sqq") - col("sq") * col("sq")
            <= col("sq") * col("sq"), "Y")
          .otherwise("Z").as("xyz"))
    abc.join(xyz, Seq("part"))
      .crossJoin(broadcast(tot))
      .groupBy(col("abc"), col("xyz"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("cents")).as("revenue_cents"),
        expr("CAST((1000000 * CAST(sum(cents) AS DECIMAL(38,0))) " +
          "div max(tc) AS BIGINT)").as("share_ppm"))
      .orderBy(col("abc"), col("xyz"))
  }

  /** Two-way fixed-effects discount elasticity: quantity on discount
    * permille with brand AND month effects removed by the within
    * transform x̃ = x − x̄_brand − x̄_month + x̄ (means from exact
    * integer sums), each x̃·ỹ / x̃² product micro-quantized BEFORE
    * summation (order-free), vs the naive pooled OLS slope — "how
    * much of the discount response survives controlling for who and
    * when". */
  def q405: Q = {
    val xb = "(CAST(sxb AS DOUBLE) / CAST(nb AS DOUBLE))"
    val yb = "(CAST(syb AS DOUBLE) / CAST(nb AS DOUBLE))"
    val xm = "(CAST(sxm AS DOUBLE) / CAST(nm AS DOUBLE))"
    val ym = "(CAST(sym AS DOUBLE) / CAST(nm AS DOUBLE))"
    val xg = "(CAST(sxg AS DOUBLE) / CAST(ng AS DOUBLE))"
    val yg = "(CAST(syg AS DOUBLE) / CAST(ng AS DOUBLE))"
    val xt = s"(CAST(x AS DOUBLE) - $xb - $xm + $xg)"
    val yt = s"(CAST(y AS DOUBLE) - $yb - $ym + $yg)"
    val txy = "CAST(floor(CAST(1000000.0 * " + xt + " * " + yt +
      " AS DECIMAL(28,6))) AS BIGINT)"
    val txx = "CAST(floor(CAST(1000000.0 * " + xt + " * " + xt +
      " AS DECIMAL(28,6))) AS BIGINT)"
    val feSlope = "CASE WHEN stxx > 0 THEN CAST(floor(CAST(" +
      "1000.0 * CAST(stxy AS DOUBLE) / CAST(stxx AS DOUBLE)" +
      " AS DECIMAL(28,6))) AS BIGINT) END"
    val olsSlope = "CASE WHEN ng * sxxg - sxg * sxg > 0 THEN " +
      "CAST(floor(CAST(1000.0 * " +
      "(CAST(ng AS DOUBLE) * CAST(sxyg AS DOUBLE)" +
      " - CAST(sxg AS DOUBLE) * CAST(syg AS DOUBLE))" +
      " / (CAST(ng AS DOUBLE) * CAST(sxxg AS DOUBLE)" +
      " - CAST(sxg AS DOUBLE) * CAST(sxg AS DOUBLE))" +
      " AS DECIMAL(28,6))) AS BIGINT) END"
    Q("q405_fixed_effects_elasticity",
      Some(s"""
        |WITH v AS (
        |  SELECT p.p_brand AS b,
        |         CAST(year(l.l_shipdate) * 12 + month(l.l_shipdate)
        |              AS BIGINT) AS m,
        |         CAST(l.l_discount * 1000 AS BIGINT) AS x,
        |         CAST(l.l_quantity AS BIGINT) AS y
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
        |gb AS (SELECT b, count(*) AS nb, sum(x) AS sxb, sum(y) AS syb
        |       FROM v GROUP BY 1),
        |gm AS (SELECT m, count(*) AS nm, sum(x) AS sxm, sum(y) AS sym
        |       FROM v GROUP BY 1),
        |gg AS (SELECT count(*) AS ng, sum(x) AS sxg, sum(y) AS syg,
        |              sum(x * y) AS sxyg, sum(x * x) AS sxxg
        |       FROM v),
        |terms AS (
        |  SELECT $txy AS txy, $txx AS txx
        |  FROM v JOIN gb USING (b) JOIN gm USING (m) CROSS JOIN gg),
        |st AS (SELECT sum(txy) AS stxy, sum(txx) AS stxx FROM terms)
        |SELECT CAST(gg.ng AS BIGINT) AS n_rows,
        |       $feSlope AS fe_slope_milli,
        |       $olsSlope AS ols_slope_milli
        |FROM st CROSS JOIN gg
        |""".stripMargin)) { (s, dir) =>
      val v = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)),
          col("p_partkey") === col("l_partkey"))
        .select(col("p_brand").as("b"),
          (year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
            .cast("long").as("m"),
          (col("l_discount") * 1000).cast("decimal(38,0)").cast("long")
            .as("x"),
          col("l_quantity").cast("long").as("y"))
        .materialize() // fact projection feeds 3 mean passes + terms
      val gb = v.groupBy(col("b")).agg(count(lit(1)).as("nb"),
        sum(col("x")).as("sxb"), sum(col("y")).as("syb"))
      val gm = v.groupBy(col("m")).agg(count(lit(1)).as("nm"),
        sum(col("x")).as("sxm"), sum(col("y")).as("sym"))
      val gg = v.agg(count(lit(1)).as("ng"),
        sum(col("x")).as("sxg"), sum(col("y")).as("syg"),
        sum(col("x") * col("y")).as("sxyg"),
        sum(col("x") * col("x")).as("sxxg"))
      v.join(broadcast(gb), Seq("b"))
        .join(broadcast(gm), Seq("m"))
        .crossJoin(broadcast(gg))
        .select(expr(txy).as("txy"), expr(txx).as("txx"))
        .agg(sum(col("txy")).as("stxy"), sum(col("txx")).as("stxx"))
        .crossJoin(broadcast(gg))
        .select(col("ng").as("n_rows"),
          expr(feSlope).as("fe_slope_milli"),
          expr(olsSlope).as("ols_slope_milli"))
    }
  }

  /** Price stickiness per brand: month-over-month unit-price change
    * frequency and mean absolute change over each part's OBSERVED
    * month sequence (lag window keyed by part — no calendar fill, so
    * "change" means "differs from the last month it traded"). Unit
    * prices are the milli-cent rationals of q384; everything else is
    * integer counts and integer division. */
  def q406: Q = Q(
    "q406_price_stickiness",
    Some("""
      |WITH py AS (
      |  SELECT l_partkey AS part,
      |         CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT)
      |           AS ym,
      |         sum(CAST(floor(CAST(l_extendedprice * (1.0 - l_discount)
      |              AS DECIMAL(18,9)) * 100) AS BIGINT)) AS net,
      |         sum(CAST(l_quantity AS BIGINT)) AS qty
      |  FROM lineitem GROUP BY 1, 2),
      |up AS (SELECT part, ym, (1000 * net) // qty AS upm FROM py),
      |lg AS (
      |  SELECT part, upm,
      |         lag(upm) OVER (PARTITION BY part ORDER BY ym) AS prev
      |  FROM up),
      |pp AS (
      |  SELECT p.p_brand AS brand,
      |         count(*) AS n_pairs,
      |         sum(CASE WHEN lg.upm <> lg.prev THEN 1 ELSE 0 END)
      |           AS changes,
      |         sum(abs(lg.upm - lg.prev)) AS sum_abs
      |  FROM lg JOIN part p ON p.p_partkey = lg.part
      |  WHERE lg.prev IS NOT NULL
      |  GROUP BY 1)
      |SELECT brand, CAST(n_pairs AS BIGINT) AS n_pairs,
      |       CAST(changes AS BIGINT) AS changes,
      |       CAST((1000000 * changes) // n_pairs AS BIGINT)
      |         AS change_rate_ppm,
      |       CAST(sum_abs // n_pairs AS BIGINT) AS mean_abs_change_upm
      |FROM pp ORDER BY brand
      |""".stripMargin)) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val up = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey").as("part"),
        (year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
          .cast("long").as("ym"))
      .agg(sum(floor((col("l_extendedprice")
          * (lit(1.0) - col("l_discount"))).cast("decimal(18,9)") * 100)
          .cast("long")).as("net"),
        sum(col("l_quantity").cast("long")).as("qty"))
      .select(col("part"), col("ym"),
        expr("(1000 * net) div qty").as("upm"))
    val lg = up.withColumn("prev",
      lag(col("upm"), 1).over(
        Window.partitionBy(col("part")).orderBy(col("ym"))))
      .where(col("prev").isNotNull)
    lg.join(broadcast(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand").as("brand"))),
      col("p_partkey") === col("part"))
      .groupBy(col("brand"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("upm") =!= col("prev"), 1L).otherwise(0L))
          .as("changes"),
        sum(abs(col("upm") - col("prev"))).as("sum_abs"))
      .select(col("brand"), col("n_pairs"), col("changes"),
        expr("CAST((1000000 * changes) div n_pairs AS BIGINT)")
          .as("change_rate_ppm"),
        expr("CAST(sum_abs div n_pairs AS BIGINT)")
          .as("mean_abs_change_upm"))
      .orderBy(col("brand"))
  }

  /** Promotion lift by difference-in-differences: parts whose 1998
    * mean discount reached 50‰ (exact cross-multiplied mean) are the
    * treated group; outcome is per-part shipped quantity, 1997 vs
    * 1998, over the balanced panel of parts trading in both years.
    * The four group means and both deltas ride ONE double fragment
    * from exact integer sums. */
  def q407: Q = {
    def mean(sum: String, n: String) =
      s"(CAST($sum AS DOUBLE) / CAST($n AS DOUBLE))"
    val tDelta = s"(${mean("st98", "nt")} - ${mean("st97", "nt")})"
    val cDelta = s"(${mean("sc98", "nc")} - ${mean("sc97", "nc")})"
    def qm(x: String) =
      s"CAST(floor(CAST(1000.0 * ($x) AS DECIMAL(28,6))) AS BIGINT)"
    Q("q407_promo_did_lift",
      Some(s"""
        |WITH y97 AS (
        |  SELECT l_partkey AS part, sum(CAST(l_quantity AS BIGINT)) AS q
        |  FROM lineitem WHERE year(l_shipdate) = 1997 GROUP BY 1),
        |y98 AS (
        |  SELECT l_partkey AS part, sum(CAST(l_quantity AS BIGINT)) AS q,
        |         sum(CAST(l_discount * 1000 AS BIGINT)) AS sd,
        |         count(*) AS nl
        |  FROM lineitem WHERE year(l_shipdate) = 1998 GROUP BY 1),
        |panel AS (
        |  SELECT y98.part, y97.q AS q97, y98.q AS q98,
        |         CASE WHEN y98.sd >= 50 * y98.nl THEN 1 ELSE 0 END AS tr
        |  FROM y97 JOIN y98 ON y97.part = y98.part),
        |g AS (
        |  SELECT sum(CASE WHEN tr = 1 THEN 1 ELSE 0 END) AS nt,
        |         sum(CASE WHEN tr = 0 THEN 1 ELSE 0 END) AS nc,
        |         sum(CASE WHEN tr = 1 THEN q97 ELSE 0 END) AS st97,
        |         sum(CASE WHEN tr = 1 THEN q98 ELSE 0 END) AS st98,
        |         sum(CASE WHEN tr = 0 THEN q97 ELSE 0 END) AS sc97,
        |         sum(CASE WHEN tr = 0 THEN q98 ELSE 0 END) AS sc98
        |  FROM panel)
        |SELECT CAST(nt AS BIGINT) AS n_treated,
        |       CAST(nc AS BIGINT) AS n_control,
        |       ${qm(tDelta)} AS treated_delta_milli,
        |       ${qm(cDelta)} AS control_delta_milli,
        |       ${qm(s"$tDelta - $cDelta")} AS did_milli
        |FROM g
        |""".stripMargin)) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val y97 = li.where(year(col("l_shipdate")) === 1997)
        .groupBy(col("l_partkey").as("part"))
        .agg(sum(col("l_quantity").cast("long")).as("q97"))
      val y98 = li.where(year(col("l_shipdate")) === 1998)
        .groupBy(col("l_partkey").as("part"))
        .agg(sum(col("l_quantity").cast("long")).as("q98"),
          sum((col("l_discount") * 1000).cast("decimal(38,0)")
            .cast("long")).as("sd"),
          count(lit(1)).as("nl"))
      y97.join(y98, Seq("part"))
        .select(col("q97"), col("q98"),
          when(col("sd") >= lit(50) * col("nl"), 1L).otherwise(0L)
            .as("tr"))
        .agg(sum(when(col("tr") === 1, 1L).otherwise(0L)).as("nt"),
          sum(when(col("tr") === 0, 1L).otherwise(0L)).as("nc"),
          sum(when(col("tr") === 1, col("q97")).otherwise(0L)).as("st97"),
          sum(when(col("tr") === 1, col("q98")).otherwise(0L)).as("st98"),
          sum(when(col("tr") === 0, col("q97")).otherwise(0L)).as("sc97"),
          sum(when(col("tr") === 0, col("q98")).otherwise(0L)).as("sc98"))
        .select(col("nt").as("n_treated"), col("nc").as("n_control"),
          expr(qm(tDelta)).as("treated_delta_milli"),
          expr(qm(cDelta)).as("control_delta_milli"),
          expr(qm(s"$tDelta - $cDelta")).as("did_milli"))
    }
  }

  /** Flesch reading-ease per source: words = whitespace tokens,
    * sentences = terminal-punctuation runs ([.!?]+, min 1), syllables
    * ≈ vowel groups ([aeiou]+ on lowercased text — the classic cheap
    * proxy, same RE2/Java-common regex both engines). Each doc's
    * score is milli-quantized BEFORE the per-source mean (order-free
    * integer sums). */
  def q408: Q = {
    val flesch = "(206.835" +
      " - 1.015 * (CAST(w AS DOUBLE) / CAST(sents AS DOUBLE))" +
      " - 84.6 * (CAST(syll AS DOUBLE) / CAST(w AS DOUBLE)))"
    val docMilli =
      s"CAST(floor(CAST($flesch AS DECIMAL(28,6)) * 1000) AS BIGINT)"
    Q("q408_flesch_readability",
      Some(s"""
        |WITH m AS (
        |  SELECT source,
        |         CAST(len(${PipelineQueries.sqlTokens("text")})
        |              AS BIGINT) AS w,
        |         greatest(CAST(len(regexp_extract_all(text, '[.!?]+'))
        |              AS BIGINT), 1) AS sents,
        |         CAST(len(regexp_extract_all(lower(text), '[aeiou]+'))
        |              AS BIGINT) AS syll
        |  FROM documents WHERE trim(text) <> ''),
        |d AS (SELECT source, w, sents, syll, $docMilli AS fm FROM m)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(fm) // count(*) AS BIGINT) AS mean_flesch_milli,
        |       CAST(sum(w) // count(*) AS BIGINT) AS mean_words,
        |       CAST((1000 * sum(syll)) // sum(w) AS BIGINT)
        |         AS syll_per_word_milli
        |FROM d GROUP BY source ORDER BY source
        |""".stripMargin)) { (s, dir) =>
      Tables.documents(s, dir)
        .where(trim(col("text")) =!= "")
        .select(col("source"),
          expr("CAST(size(split(trim(text), '\\\\s+')) AS BIGINT)")
            .as("w"),
          greatest(expr("CAST(size(regexp_extract_all(text, " +
            "'[.!?]+', 0)) AS BIGINT)"), lit(1L)).as("sents"),
          expr("CAST(size(regexp_extract_all(lower(text), " +
            "'[aeiou]+', 0)) AS BIGINT)").as("syll"))
        .select(col("source"), col("w"), col("sents"), col("syll"),
          expr(docMilli).as("fm"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("fm")).as("sfm"),
          sum(col("w")).as("sw"), sum(col("syll")).as("ss"))
        .select(col("source"), col("n_docs"),
          expr("CAST(sfm div n_docs AS BIGINT)").as("mean_flesch_milli"),
          expr("CAST(sw div n_docs AS BIGINT)").as("mean_words"),
          expr("CAST((1000 * ss) div sw AS BIGINT)")
            .as("syll_per_word_milli"))
        .orderBy(col("source"))
    }
  }

  /** Wilcoxon signed-rank test of 1999-vs-1998 per-part quantity
    * (paired panel, zero diffs dropped, NO tie-variance correction —
    * stated): midranks of |d| are computed over the distinct-|d|
    * value dim in doubled units (2·midrank = 2·cnt_less + cnt + 1,
    * exact integers — q301's discipline), W⁺ rides them exactly, and
    * only the final z runs in one shared double fragment. */
  def q409: Q = {
    val z = "((CAST(w2 AS DOUBLE) / 2.0" +
      " - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 4.0)" +
      " / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)" +
      " * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0))"
    Q("q409_wilcoxon_signed_rank",
      Some(s"""
        |WITH y98 AS (
        |  SELECT l_partkey AS part, sum(CAST(l_quantity AS BIGINT)) AS q
        |  FROM lineitem WHERE year(l_shipdate) = 1998 GROUP BY 1),
        |y99 AS (
        |  SELECT l_partkey AS part, sum(CAST(l_quantity AS BIGINT)) AS q
        |  FROM lineitem WHERE year(l_shipdate) = 1999 GROUP BY 1),
        |d AS (
        |  SELECT y99.q - y98.q AS d, abs(y99.q - y98.q) AS av
        |  FROM y98 JOIN y99 ON y98.part = y99.part
        |  WHERE y99.q <> y98.q),
        |vd AS (
        |  SELECT av, count(*) AS cnt,
        |         sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS pos
        |  FROM d GROUP BY 1),
        |r AS (
        |  SELECT av, cnt, pos,
        |         CAST(coalesce(sum(cnt) OVER (ORDER BY av
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |         AS BIGINT) AS less
        |  FROM vd),
        |agg AS (
        |  SELECT sum(cnt) AS n,
        |         sum(pos * (2 * less + cnt + 1)) AS w2
        |  FROM r)
        |SELECT CAST(n AS BIGINT) AS n_pairs, CAST(w2 AS BIGINT) AS w2,
        |       CAST(floor(CAST(1000.0 * $z AS DECIMAL(28,6))) AS BIGINT)
        |         AS z_milli
        |FROM agg
        |""".stripMargin)) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val li = Tables.lineitem(s, dir)
      def yr(y: Int) = li.where(year(col("l_shipdate")) === y)
        .groupBy(col("l_partkey").as("part"))
        .agg(sum(col("l_quantity").cast("long")).as(s"q$y"))
      val d = yr(1998).join(yr(1999), Seq("part"))
        .where(col("q1999") =!= col("q1998"))
        .select((col("q1999") - col("q1998")).as("d"),
          abs(col("q1999") - col("q1998")).as("av"))
      val vd = d.groupBy(col("av"))
        .agg(count(lit(1)).as("cnt"),
          sum(when(col("d") > 0, 1L).otherwise(0L)).as("pos"))
      // distinct-|d| value dim is range-bounded → the ordered window
      // runs over a dim, never the panel
      val r = vd.withColumn("less",
        coalesce(sum(col("cnt")).over(Window.orderBy(col("av"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      r.agg(sum(col("cnt")).as("n"),
        sum(col("pos") * (lit(2) * col("less") + col("cnt") + 1))
          .as("w2"))
        .select(col("n").as("n_pairs"), col("w2"),
          expr(s"CAST(floor(CAST(1000.0 * $z AS DECIMAL(28,6))) " +
            "AS BIGINT)").as("z_milli"))
    }
  }

  /** Association between customer market segment and order priority:
    * the full contingency table's chi-square from exact integer
    * (O·N − R·C)² terms (each cell micro-quantized before the
    * 25-term sum) and Cramér's V — "does WHO you sell to determine
    * HOW urgently they order". min(r,c) comes from the data, not a
    * constant. */
  def q410: Q = {
    val term = "CAST(floor(CAST(1000000.0 * " +
      "(CAST(o * nn - r * c AS DOUBLE) * CAST(o * nn - r * c AS DOUBLE))" +
      " / (CAST(nn AS DOUBLE) * CAST(r AS DOUBLE) * CAST(c AS DOUBLE))" +
      " AS DECIMAL(28,6))) AS BIGINT)"
    val v = "sqrt((CAST(chi2_micro AS DOUBLE) / 1000000.0)" +
      " / (CAST(nn AS DOUBLE) * CAST(mindim AS DOUBLE)))"
    Q("q410_segment_priority_cramers_v",
      Some(s"""
        |WITH so AS (
        |  SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
        |cell AS (SELECT seg, pri, count(*) AS o FROM so GROUP BY 1, 2),
        |rr AS (SELECT seg, sum(o) AS r FROM cell GROUP BY 1),
        |cc AS (SELECT pri, sum(o) AS c FROM cell GROUP BY 1),
        |t AS (SELECT sum(o) AS nn,
        |             least(count(DISTINCT seg), count(DISTINCT pri)) - 1
        |               AS mindim
        |      FROM cell),
        |terms AS (
        |  SELECT $term AS tm
        |  FROM cell JOIN rr USING (seg) JOIN cc USING (pri) CROSS JOIN t),
        |agg AS (SELECT sum(tm) AS chi2_micro FROM terms)
        |SELECT CAST(t.nn AS BIGINT) AS n_orders,
        |       CAST((SELECT count(*) FROM cell) AS BIGINT) AS n_cells,
        |       CAST(agg.chi2_micro AS BIGINT) AS chi2_micro,
        |       CAST(floor(CAST(1000.0 * $v AS DECIMAL(28,6))) AS BIGINT)
        |         AS v_milli
        |FROM agg CROSS JOIN t
        |""".stripMargin)) { (s, dir) =>
      val so = Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
          col("c_custkey") === col("o_custkey"))
        .select(col("seg"), col("o_orderpriority").as("pri"))
      val cell = so.groupBy(col("seg"), col("pri"))
        .agg(count(lit(1)).as("o"))
        .materialize() // 25-cell dim feeds margins, totals, and terms
      val rr = cell.groupBy(col("seg")).agg(sum(col("o")).as("r"))
      val ccM = cell.groupBy(col("pri")).agg(sum(col("o")).as("c"))
      val t = cell.agg(sum(col("o")).as("nn"),
        (least(countDistinct(col("seg")), countDistinct(col("pri")))
          - 1).as("mindim"))
      val nc = cell.agg(count(lit(1)).as("n_cells"))
      cell.join(broadcast(rr), Seq("seg"))
        .join(broadcast(ccM), Seq("pri"))
        .crossJoin(broadcast(t))
        .select(expr(term).as("tm"))
        .agg(sum(col("tm")).as("chi2_micro"))
        .crossJoin(broadcast(t))
        .crossJoin(broadcast(nc))
        .select(col("nn").as("n_orders"), col("n_cells"),
          col("chi2_micro"),
          expr(s"CAST(floor(CAST(1000.0 * $v AS DECIMAL(28,6))) " +
            "AS BIGINT)").as("v_milli"))
    }
  }
}
