package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Materialize.MatOps
import graft.Tables
import graft.text.TextAnalysis

/** Round-7 index-and-effects wave: intra-document topic drift,
  * the Törnqvist price index (completing the Laspeyres/Paasche/
  * Fisher/chained family with the superlative log-form), quantile
  * treatment effects, local peak detection with prominence, and an
  * Engle–Granger cointegration screen. Index logs and residual
  * arithmetic follow the established quantize-then-sum discipline;
  * the EG residuals reuse q503's exact common-denominator closed
  * form with a power-of-two downscale (exact double ops only). */
object IndexQueries {

  val all: Seq[Q] = Seq(q521, q522, q523, q524, q525)

  /** Intra-document drift: Jaccard overlap between the first-half and
    * second-half token SETS of each document, histogrammed by permille
    * decile — low overlap flags multi-topic or concatenated documents
    * (a chunking-policy diagnostic for training-data prep). Exact set
    * arithmetic per document. */
  def q521: Q = Q(
    "q521_intra_doc_drift",
    Some("""
      |WITH tok AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ts
      |  FROM documents),
      |pos AS (
      |  SELECT doc_id, ts[i] AS t,
      |         CASE WHEN 2 * i <= len(ts) THEN 0 ELSE 1 END AS h
      |  FROM tok, unnest(range(1, len(ts) + 1)) AS u(i)
      |  WHERE len(ts) >= 2),
      |tt AS (
      |  SELECT doc_id, t, max(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS in0,
      |         max(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS in1
      |  FROM pos GROUP BY 1, 2),
      |dj AS (
      |  SELECT doc_id,
      |         (1000 * sum(in0 * in1)) // count(*) AS j
      |  FROM tt GROUP BY 1)
      |SELECT CAST(j // 100 AS BIGINT) AS decile,
      |       CAST(count(*) AS BIGINT) AS n_docs
      |FROM dj GROUP BY 1 ORDER BY 1
      |""".stripMargin)) { (s, dir) =>
    val pos = Tables.documents(s, dir)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ts"))
      .where(size(col("ts")) >= 2)
      .select(col("doc_id"), posexplode(col("ts")).as(Seq("i", "t")),
        size(col("ts")).as("len"))
      .select(col("doc_id"), col("t"),
        when(lit(2) * (col("i") + 1) <= col("len"), 0L).otherwise(1L)
          .as("h"))
    val tt = pos.groupBy(col("doc_id"), col("t"))
      .agg(max(when(col("h") === 0, 1L).otherwise(0L)).as("in0"),
        max(when(col("h") === 1, 1L).otherwise(0L)).as("in1"))
    val dj = tt.groupBy(col("doc_id"))
      .agg(expr("(1000 * sum(in0 * in1)) div count(1)").as("j"))
    dj.groupBy(expr("j div 100").as("decile"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("decile"))
  }

  /** Törnqvist price index (early half → late half) over parts traded
    * in both: exp(Σ w̄·ln(p₁/p₀)) with unit prices as exact revenue/
    * quantity rationals, the log ratio per item micro-quantized as
    * ln(e₁q₀) − ln(e₀q₁), and revenue shares exact micro integers —
    * the superlative index the Laspeyres/Paasche/Fisher family (q384/
    * q391) brackets. One exp at the end. */
  def q522: Q = Q(
    "q522_tornqvist_index",
    Some("""
      |WITH h AS (
      |  SELECT l_partkey AS pk,
      |         CASE WHEN year(l_shipdate) <= 1997 THEN 0 ELSE 1 END AS hh,
      |         CAST(sum(CAST(l_extendedprice * 100 AS HUGEINT)) AS BIGINT)
      |           AS e,
      |         CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
      |           AS q
      |  FROM lineitem GROUP BY 1, 2),
      |b AS (
      |  SELECT a.pk, a.e AS e0, a.q AS q0, c.e AS e1, c.q AS q1
      |  FROM h a JOIN h c ON a.pk = c.pk AND a.hh = 0 AND c.hh = 1
      |  WHERE a.e > 0 AND c.e > 0 AND a.q > 0 AND c.q > 0),
      |tot AS (SELECT sum(e0) AS t0, sum(e1) AS t1 FROM b),
      |tq AS (
      |  SELECT sum((
      |      (1000000 * b.e0) // tot.t0 + (1000000 * b.e1) // tot.t1)
      |      * (CAST(floor(CAST(
      |           ln(CAST(b.e1 AS DOUBLE) * CAST(b.q0 AS DOUBLE))
      |           - ln(CAST(b.e0 AS DOUBLE) * CAST(b.q1 AS DOUBLE))
      |         AS DECIMAL(28,9)) * 1000000) AS BIGINT))) AS s,
      |         count(*) AS n
      |  FROM b CROSS JOIN tot)
      |SELECT CAST(n AS BIGINT) AS n_items,
      |       CAST(floor(CAST(CAST(s AS DOUBLE) / 2000000.0
      |            AS DECIMAL(28,6))) AS BIGINT) AS ln_index_micro,
      |       CAST(floor(CAST(exp(CAST(s AS DOUBLE) / 2000000000000.0)
      |            AS DECIMAL(28,6)) * 1000) AS BIGINT)
      |         AS tornqvist_milli
      |FROM tq
      |""".stripMargin)) { (s, dir) =>
    val h = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey").as("pk"),
        when(year(col("l_shipdate")) <= 1997, 0).otherwise(1).as("hh"))
      .agg(expr("CAST(sum(CAST(l_extendedprice * 100 AS DECIMAL(38,0)))" +
        " AS BIGINT)").as("e"),
        sum(expr("CAST(floor(l_quantity + 0.5) AS BIGINT)")).as("q"))
      .materialize()
    val b = h.where(col("hh") === 0 && col("e") > 0 && col("q") > 0)
      .select(col("pk"), col("e").as("e0"), col("q").as("q0"))
      .join(h.where(col("hh") === 1 && col("e") > 0 && col("q") > 0)
        .select(col("pk").as("bpk"), col("e").as("e1"),
          col("q").as("q1")), col("pk") === col("bpk"))
      .materialize()
    val tot = b.agg(sum(col("e0")).as("t0"), sum(col("e1")).as("t1"))
    b.crossJoin(broadcast(tot))
      .agg(sum(expr("""((1000000 * e0) div t0 + (1000000 * e1) div t1)
          * (CAST(floor(CAST(
               ln(CAST(e1 AS DOUBLE) * CAST(q0 AS DOUBLE))
               - ln(CAST(e0 AS DOUBLE) * CAST(q1 AS DOUBLE))
             AS DECIMAL(28,9)) * 1000000) AS BIGINT))""")).as("s"),
        count(lit(1)).as("n"))
      .select(col("n").as("n_items"),
        expr("CAST(floor(CAST(CAST(s AS DOUBLE) / 2000000.0" +
          " AS DECIMAL(28,6))) AS BIGINT)").as("ln_index_micro"),
        expr("CAST(floor(CAST(exp(CAST(s AS DOUBLE) / 2000000000000.0)" +
          " AS DECIMAL(28,6)) * 1000) AS BIGINT)").as("tornqvist_milli"))
  }

  /** Quantile treatment effects: the urgent-minus-other fulfillment
    * span gap at each decile (exact per-group order statistics) — the
    * DISTRIBUTIONAL view the mean-effect faces (q489/q510) can't give:
    * does urgency help the median order, the tail, or nobody? */
  def q523: Q = Q(
    "q523_quantile_treatment_effects",
    Some("""
      |WITH ord AS (
      |  SELECT CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0
      |         END AS g,
      |         max(epoch_us(l.l_shipdate) // 86400000000)
      |           - epoch_us(o.o_orderdate) // 86400000000 + 1 AS t
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |  GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
      |  HAVING max(epoch_us(l.l_shipdate) // 86400000000)
      |         >= epoch_us(o.o_orderdate) // 86400000000),
      |qs AS (
      |  SELECT g, p.p,
      |         max(CASE WHEN rn = (p.p * n + 999) // 1000 THEN t END) AS v
      |  FROM (SELECT g, t, row_number() OVER (PARTITION BY g ORDER BY t)
      |               AS rn, count(*) OVER (PARTITION BY g) AS n FROM ord) r
      |  CROSS JOIN (SELECT unnest([100, 200, 300, 400, 500, 600, 700,
      |                             800, 900]) AS p) p
      |  GROUP BY 1, 2)
      |SELECT CAST(a.p AS BIGINT) AS p_permille,
      |       CAST(a.v AS BIGINT) AS urgent_days,
      |       CAST(c.v AS BIGINT) AS other_days,
      |       CAST(a.v - c.v AS BIGINT) AS qte_days
      |FROM qs a JOIN qs c ON a.p = c.p AND a.g = 1 AND c.g = 0
      |ORDER BY p_permille
      |""".stripMargin)) { (s, dir) =>
    val ord = Tables.orders(s, dir)
      .select(col("o_orderkey").as("id"),
        when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
          .as("g"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))" +
          " div 86400000000").as("a"))
      .join(Tables.lineitem(s, dir)
        .select(col("l_orderkey"),
          expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))" +
            " div 86400000000").as("sd")),
        col("id") === col("l_orderkey"))
      .groupBy(col("id"), col("g"), col("a"))
      .agg(max(col("sd")).as("done"))
      .where(col("done") >= col("a"))
      .select(col("g"), (col("done") - col("a") + 1).as("t"))
    val qs = graft.operators.OrderStats.quantilesDisc(
        ord, Seq("g"), "t",
        Seq(100, 200, 300, 400, 500, 600, 700, 800, 900))
      .materialize()
    qs.where(col("g") === 1)
      .select(col("permille").as("p"), col("value").as("urgent_days"))
      .join(qs.where(col("g") === 0)
        .select(col("permille").as("cp"), col("value").as("other_days")),
        col("p") === col("cp"))
      .select(col("p").cast("long").as("p_permille"), col("urgent_days"),
        col("other_days"),
        (col("urgent_days") - col("other_days")).as("qte_days"))
      .orderBy(col("p_permille"))
  }

  /** Local peak detection on daily revenue: a peak strictly exceeds
    * its three neighbors each side, with prominence = height above the
    * higher of the two flanking minima — the top-5 spike table an
    * on-call person gets, as pure integer comparisons over value lags
    * on the calendar grid. */
  def q524: Q = Q(
    "q524_revenue_peaks",
    Some(s"""
      |WITH ${Scaffolds.sqlDailyDollars},
      |nb AS (
      |  SELECT day, x,
      |         lag(x, 1) OVER (ORDER BY day) AS l1,
      |         lag(x, 2) OVER (ORDER BY day) AS l2,
      |         lag(x, 3) OVER (ORDER BY day) AS l3,
      |         lead(x, 1) OVER (ORDER BY day) AS r1,
      |         lead(x, 2) OVER (ORDER BY day) AS r2,
      |         lead(x, 3) OVER (ORDER BY day) AS r3
      |  FROM grid),
      |pk AS (
      |  SELECT day, x,
      |         x - greatest(least(l1, l2, l3), least(r1, r2, r3))
      |           AS prominence
      |  FROM nb
      |  WHERE l3 IS NOT NULL AND r3 IS NOT NULL
      |    AND x > l1 AND x > l2 AND x > l3
      |    AND x > r1 AND x > r2 AND x > r3)
      |SELECT CAST(day AS BIGINT) AS day,
      |       CAST(x AS BIGINT) AS revenue_dollars,
      |       CAST(prominence AS BIGINT) AS prominence_dollars
      |FROM pk ORDER BY prominence DESC, day LIMIT 5
      |""".stripMargin)) { (s, dir) =>
    val grid = Scaffolds.dailyDollars(s, dir)
    val w = Window.orderBy(col("day")) // calendar-bounded
    val nb = grid.select(col("day"), col("x"),
      lag(col("x"), 1).over(w).as("l1"), lag(col("x"), 2).over(w).as("l2"),
      lag(col("x"), 3).over(w).as("l3"), lead(col("x"), 1).over(w).as("r1"),
      lead(col("x"), 2).over(w).as("r2"), lead(col("x"), 3).over(w).as("r3"))
    nb.where(col("l3").isNotNull && col("r3").isNotNull
        && col("x") > col("l1") && col("x") > col("l2")
        && col("x") > col("l3") && col("x") > col("r1")
        && col("x") > col("r2") && col("x") > col("r3"))
      .select(col("day"), col("x").as("revenue_dollars"),
        (col("x") - greatest(least(col("l1"), col("l2"), col("l3")),
          least(col("r1"), col("r2"), col("r3"))))
          .as("prominence_dollars"))
      .orderBy(col("prominence_dollars").desc, col("day"))
      .limit(5)
  }

  /** Engle–Granger cointegration screen between Brand#11's monthly
    * revenue and the rest-of-market series: stage-1 OLS residuals in
    * the exact n·den-scaled closed form (q503's discipline, 2⁷⁰
    * power-of-two downscale — exact double ops only), then the
    * Dickey–Fuller regression Δe_t = γ·e_{t−1}: γ and its t-statistic
    * from exact integer sums. Strongly negative t ⇒ residuals mean-
    * revert ⇒ the two series co-move beyond trend. */
  def q525: Q = {
    val down = "1.1805916207174113E21" // 2^70, exact as a double
    Q("q525_engle_granger",
      Some(s"""
        |WITH m AS (
        |  SELECT year(l.l_shipdate) * 12 + month(l.l_shipdate) AS mo,
        |         CAST(sum(CASE WHEN p.p_brand = 'Brand#11'
        |              THEN CAST(l.l_extendedprice * 100 AS HUGEINT)
        |              ELSE 0 END) // 100 AS BIGINT) AS y,
        |         CAST(sum(CASE WHEN p.p_brand != 'Brand#11'
        |              THEN CAST(l.l_extendedprice * 100 AS HUGEINT)
        |              ELSE 0 END) // 100 AS BIGINT) AS x
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1),
        |mo_ AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |               sum(CAST(x AS HUGEINT) * y) AS sxy,
        |               sum(CAST(x AS HUGEINT) * x) AS sxx FROM m),
        |fr AS (
        |  SELECT n, sx, sy,
        |         CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS kn,
        |         CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS dn
        |  FROM mo_),
        |res AS (
        |  SELECT m.mo,
        |         CAST(floor(CAST(CAST(m.y AS HUGEINT) * fr.n * fr.dn
        |            - (CAST(fr.sy AS HUGEINT) * fr.dn - fr.kn * fr.sx)
        |            - fr.n * fr.kn * m.x AS DOUBLE) / $down) AS BIGINT)
        |           AS e
        |  FROM m CROSS JOIN fr),
        |df AS (
        |  SELECT count(*) AS tt,
        |         sum(CAST(b.e AS HUGEINT) * (a.e - b.e)) AS av,
        |         sum(CAST(b.e AS HUGEINT) * b.e) AS bv,
        |         sum(CAST(a.e - b.e AS HUGEINT) * (a.e - b.e)) AS dd
        |  FROM res a JOIN res b ON a.mo = b.mo + 1)
        |SELECT CAST(tt AS BIGINT) AS n_diffs,
        |       CAST(floor(CAST(CAST(av AS DOUBLE) / CAST(bv AS DOUBLE)
        |            AS DECIMAL(28,9)) * 1000000) AS BIGINT)
        |         AS gamma_micro,
        |       CAST(floor(CAST(
        |           CAST(av AS DOUBLE) * sqrt(CAST(tt - 1 AS DOUBLE))
        |             / sqrt(CAST(bv AS DOUBLE) * CAST(dd AS DOUBLE)
        |                    - CAST(av AS DOUBLE) * CAST(av AS DOUBLE))
        |         AS DECIMAL(28,6)) * 1000) AS BIGINT) AS adf_t_milli,
        |       CASE WHEN CAST(av AS DOUBLE) * sqrt(CAST(tt - 1 AS DOUBLE))
        |             / sqrt(CAST(bv AS DOUBLE) * CAST(dd AS DOUBLE)
        |                    - CAST(av AS DOUBLE) * CAST(av AS DOUBLE))
        |            < -1.94 THEN 'mean_reverting'
        |            ELSE 'no_evidence' END AS verdict
        |FROM df
        |""".stripMargin)) { (s, dir) =>
      val m = Tables.lineitem(s, dir)
        .join(Tables.part(s, dir)
          .select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy((year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
          .as("mo"))
        .agg(expr("CAST(sum(CASE WHEN p_brand = 'Brand#11'" +
          " THEN CAST(l_extendedprice * 100 AS DECIMAL(38,0))" +
          " ELSE CAST(0 AS DECIMAL(38,0)) END) div 100 AS BIGINT)")
          .as("y"),
          expr("CAST(sum(CASE WHEN p_brand != 'Brand#11'" +
            " THEN CAST(l_extendedprice * 100 AS DECIMAL(38,0))" +
            " ELSE CAST(0 AS DECIMAL(38,0)) END) div 100 AS BIGINT)")
            .as("x"))
        .materialize() // month dim
      val mo = m.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"))
      val fr = mo.select(col("n"), col("sx"), col("sy"),
        expr("CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0))" +
          " * sy").as("kn"),
        expr("CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0))" +
          " * sx").as("dn"))
      val res = m.crossJoin(broadcast(fr))
        .select(col("mo"),
          expr(s"CAST(floor(CAST(CAST(y AS DECIMAL(38,0)) * n * dn" +
            s" - (CAST(sy AS DECIMAL(38,0)) * dn - kn * sx)" +
            s" - n * kn * x AS DOUBLE) / $down) AS BIGINT)").as("e"))
        .materialize()
      val df = res.as("a")
        .join(res.select((col("mo") + 1).as("bmo"), col("e").as("be")),
          col("mo") === col("bmo"))
        .agg(count(lit(1)).as("tt"),
          sum(col("be").cast("decimal(38,0)") * (col("e") - col("be")))
            .as("av"),
          sum(col("be").cast("decimal(38,0)") * col("be")).as("bv"),
          sum((col("e") - col("be")).cast("decimal(38,0)")
            * (col("e") - col("be"))).as("dd"))
      val tExpr = "CAST(av AS DOUBLE) * sqrt(CAST(tt - 1 AS DOUBLE))" +
        " / sqrt(CAST(bv AS DOUBLE) * CAST(dd AS DOUBLE)" +
        " - CAST(av AS DOUBLE) * CAST(av AS DOUBLE))"
      df.select(col("tt").as("n_diffs"),
        expr("CAST(floor(CAST(CAST(av AS DOUBLE) / CAST(bv AS DOUBLE)" +
          " AS DECIMAL(28,9)) * 1000000) AS BIGINT)").as("gamma_micro"),
        expr(s"CAST(floor(CAST($tExpr AS DECIMAL(28,6)) * 1000)" +
          " AS BIGINT)").as("adf_t_milli"),
        expr(s"CASE WHEN $tExpr < -1.94 THEN 'mean_reverting'" +
          " ELSE 'no_evidence' END").as("verdict"))
    }
  }
}
