package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-9 actuarial-reserving wave: the classic claims run-off
  * triangle re-read onto the order book (origin = order year,
  * development lag = ship year − order year, "paid" = shipped
  * extendedprice cents as-at the 2001-08-01 valuation date), then the
  * full chain-ladder ladder: volume-weighted link ratios (LDFs),
  * recursive ultimates + IBNR, Mack's σ² process-variance estimator,
  * Bornhuetter-Ferguson ultimates against an oldest-origin prior, and
  * the Stanard-Bühlmann (Cape Cod) decay-free ELR.
  *
  * Scale notes: the triangle is a ≤7×7 origin×dev dim — ONE fact pass
  * builds it (join pushes only (orderkey, extendedprice, shipdate)
  * against (orderkey, orderdate)); everything downstream is dim-sized.
  * The development walk is a ≤6-step integer fold: Spark folds with
  * the `aggregate` HOF over the sorted 6-row factor array (exact
  * DECIMAL(38,0) arithmetic, per-step floor rescale), DuckDB replays
  * the identical walk as a RECURSIVE CTE (list_reduce is engine-buggy
  * on struct accumulators — NOTES.md round 9). Both sides do the same
  * integer ops in the same order, so every output digit is exact.
  */
object ActuarialQueries {

  val all: Seq[Q] = Seq(q781, q782, q783, q784, q785)

  /** Exact positive-decimal floor division (the quotient is made
    * integral by subtracting the remainder first, so the decimal
    * division's scale rounding is a no-op). */
  private def fd(a: String, b: String): String =
    s"CAST((($a) - (($a) % ($b))) / ($b) AS DECIMAL(38,0))"

  /** Oracle triangle: `tri(origin, dev, inc)` incremental shipped
    * cents, `cum(origin, dev, c)` cumulative. Valuation cutoff
    * 2001-08-01 right-censors exactly like a reserving as-at date. */
  private def sqlTri: String = """
    |tri AS (
    |  SELECT year(o.o_orderdate) AS origin,
    |         year(l.l_shipdate) - year(o.o_orderdate) AS dev,
    |         sum(CAST(l.l_extendedprice * 100 AS BIGINT)) AS inc
    |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    |  WHERE l.l_shipdate >= o.o_orderdate
    |    AND l.l_shipdate <= TIMESTAMP '2001-08-01'
    |  GROUP BY 1, 2),
    |cum AS (
    |  SELECT origin, dev,
    |         sum(inc) OVER (PARTITION BY origin ORDER BY dev) AS c
    |  FROM tri)""".stripMargin

  /** Oracle volume-weighted link ratios `f(dev, n, num, den, fm)`. */
  private def sqlF: String = """
    |f AS (
    |  SELECT a.dev AS dev, count(*) AS n,
    |         sum(b.c) AS num, sum(a.c) AS den,
    |         (1000000 * sum(b.c)) // sum(a.c) AS fm
    |  FROM cum a JOIN cum b ON b.origin = a.origin AND b.dev = a.dev + 1
    |  GROUP BY 1)""".stripMargin

  /** Oracle latest diagonal + the recursive development walk carrying
    * both the ultimate (u, seeded at the latest cumulative) and the
    * cumulative development factor (g, seeded at 1e6 micro). */
  private def sqlWalk: String = """
    |latest AS (
    |  SELECT origin, max(dev) AS d0, max_by(c, dev) AS c0
    |  FROM cum GROUP BY 1),
    |walk AS (
    |  SELECT origin, d0 AS d, CAST(c0 AS HUGEINT) AS u,
    |         CAST(1000000 AS HUGEINT) AS g
    |  FROM latest
    |  UNION ALL
    |  SELECT w.origin, w.d + 1, (w.u * f.fm) // 1000000,
    |         (w.g * f.fm) // 1000000
    |  FROM walk w JOIN f ON f.dev = w.d),
    |devo AS (
    |  SELECT origin, max_by(u, d) AS ult, max_by(g, d) AS cdf
    |  FROM walk GROUP BY 1)""".stripMargin

  /** Spark cumulative triangle (origin, dev, c) — dim-sized output of
    * one fact pass. */
  private def cumBase(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tri = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_shipdate"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .where(col("l_shipdate") >= col("o_orderdate") &&
        col("l_shipdate") <= expr("TIMESTAMP '2001-08-01'"))
      .select(year(col("o_orderdate")).as("origin"),
        (year(col("l_shipdate")) - year(col("o_orderdate"))).as("dev"),
        expr("CAST(CAST(l_extendedprice * 100 AS DECIMAL(38,0)) AS LONG)")
          .as("v"))
      .groupBy(col("origin"), col("dev"))
      .agg(sum(col("v").cast("decimal(38,0)")).as("inc"))
    tri.select(col("origin"), col("dev"),
      sum(col("inc")).over(
        Window.partitionBy(col("origin")).orderBy(col("dev"))).as("c"))
  }

  /** Spark link-ratio dim (dev, n, num, den, fm) from the cum self-pair. */
  private def fBase(cum: DataFrame): DataFrame = {
    val a = cum.select(col("origin"), col("dev"), col("c"))
    val b = cum.select(col("origin").as("origin2"),
      (col("dev") - 1).as("dev2"), col("c").as("c1"))
    a.join(b, col("origin") === col("origin2") && col("dev") === col("dev2"))
      .groupBy(col("dev"))
      .agg(count(lit(1)).as("n"), sum(col("c1")).as("num"),
        sum(col("c")).as("den"))
      .select(col("dev"), col("n"), col("num"), col("den"),
        expr(fd("1000000 * num", "den")).as("fm"))
  }

  /** Spark development walk: latest diagonal × broadcast sorted factor
    * array, folded with the `aggregate` HOF (same per-step integer
    * floor rescale as the oracle's recursive walk). */
  private def walkBase(s: SparkSession, dir: String): DataFrame = {
    val cum = cumBase(s, dir).materialize()
    val latest = cum.groupBy(col("origin"))
      .agg(max(col("dev")).as("d0"), max_by(col("c"), col("dev")).as("c0"))
    val farr = fBase(cum)
      .agg(sort_array(collect_list(struct(col("dev"), col("fm")))).as("fs"))
    latest.crossJoin(broadcast(farr))
      .withColumn("acc", expr(
        """aggregate(
          |  filter(fs, x -> x.dev >= d0),
          |  named_struct('u', CAST(c0 AS DECIMAL(38,0)),
          |               'g', CAST(1000000 AS DECIMAL(38,0))),
          |  (acc, x) -> named_struct(
          |    'u', CAST((acc.u * x.fm - (acc.u * x.fm) % 1000000)
          |              / 1000000 AS DECIMAL(38,0)),
          |    'g', CAST((acc.g * x.fm - (acc.g * x.fm) % 1000000)
          |              / 1000000 AS DECIMAL(38,0))))""".stripMargin))
      .select(col("origin"), col("d0"), col("c0"),
        col("acc.u").as("ult"), col("acc.g").as("cdf"))
  }

  /** Spark origin-year premium proxy (booked order value cents). */
  private def premBase(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(year(col("o_orderdate")).as("origin"),
        expr("CAST(CAST(o_totalprice * 100 AS DECIMAL(38,0)) AS LONG)")
          .as("v"))
      .groupBy(col("origin"))
      .agg(sum(col("v").cast("decimal(38,0)")).as("prem"))

  private def sqlPrem: String = """
    |prem AS (
    |  SELECT year(o_orderdate) AS origin,
    |         sum(CAST(o_totalprice * 100 AS BIGINT)) AS prem
    |  FROM orders GROUP BY 1)""".stripMargin

  /** Chain-ladder volume-weighted link ratios: per development lag,
    * the participating-origin count and the exact numerator/
    * denominator cent sums, with the LDF pinned in micro. */
  def q781: Q = Q(
    "q781_chain_ladder_ldf",
    Some(s"""
      |WITH ${sqlTri},${sqlF}
      |SELECT CAST(dev AS BIGINT) AS dev,
      |       CAST(n AS BIGINT) AS n_origins,
      |       CAST(num AS BIGINT) AS num_cents,
      |       CAST(den AS BIGINT) AS den_cents,
      |       CAST(fm AS BIGINT) AS ldf_micro
      |FROM f ORDER BY dev
      |""".stripMargin)) { (s, dir) =>
    fBase(cumBase(s, dir))
      .select(col("dev").cast("long").as("dev"),
        col("n").cast("long").as("n_origins"),
        col("num").cast("long").as("num_cents"),
        col("den").cast("long").as("den_cents"),
        col("fm").cast("long").as("ldf_micro"))
      .orderBy(col("dev"))
  }

  /** Chain-ladder ultimates: each origin's latest diagonal developed
    * through the remaining link ratios by the exact integer walk;
    * IBNR is the developed tail. */
  def q782: Q = Q(
    "q782_chain_ladder_ultimate",
    Some(s"""
      |WITH RECURSIVE ${sqlTri},${sqlF},${sqlWalk}
      |SELECT CAST(l.origin AS BIGINT) AS origin,
      |       CAST(l.d0 AS BIGINT) AS latest_dev,
      |       CAST(l.c0 AS BIGINT) AS latest_cents,
      |       CAST(d.ult AS BIGINT) AS ultimate_cents,
      |       CAST(d.ult - l.c0 AS BIGINT) AS ibnr_cents
      |FROM latest l JOIN devo d ON d.origin = l.origin
      |ORDER BY origin
      |""".stripMargin)) { (s, dir) =>
    walkBase(s, dir)
      .select(col("origin").cast("long").as("origin"),
        col("d0").cast("long").as("latest_dev"),
        col("c0").cast("long").as("latest_cents"),
        col("ult").cast("long").as("ultimate_cents"),
        (col("ult") - col("c0")).cast("long").as("ibnr_cents"))
      .orderBy(col("origin"))
  }

  /** Mack's σ²_d: the volume-weighted variance of per-origin link
    * ratios around the pooled LDF, C-weighted per Mack (1993), for
    * lags with ≥2 participating origins. Individual ratios and the
    * pooled LDF share the same micro quantization, so the squared
    * residuals are exact integers. */
  def q783: Q = Q(
    "q783_mack_sigma",
    Some(s"""
      |WITH ${sqlTri},
      |pair AS (
      |  SELECT a.dev AS dev, a.origin, a.c AS c0,
      |         (1000000 * b.c) // a.c AS fo
      |  FROM cum a JOIN cum b ON b.origin = a.origin AND b.dev = a.dev + 1),
      |f AS (
      |  SELECT a.dev AS dev, count(*) AS n,
      |         (1000000 * sum(b.c)) // sum(a.c) AS fm
      |  FROM cum a JOIN cum b ON b.origin = a.origin AND b.dev = a.dev + 1
      |  GROUP BY 1)
      |SELECT CAST(p.dev AS BIGINT) AS dev,
      |       CAST(f.n AS BIGINT) AS n_origins,
      |       CAST(f.fm AS BIGINT) AS ldf_micro,
      |       CAST(sum(p.c0 * (p.fo - f.fm) * (p.fo - f.fm))
      |            // ((f.n - 1) * 1000000000000) AS BIGINT) AS sigma2_cents
      |FROM pair p JOIN f ON f.dev = p.dev
      |WHERE f.n >= 2
      |GROUP BY p.dev, f.n, f.fm ORDER BY dev
      |""".stripMargin)) { (s, dir) =>
    val cum = cumBase(s, dir).materialize()
    val b = cum.select(col("origin").as("origin2"),
      (col("dev") - 1).as("dev2"), col("c").as("c1"))
    val pair = cum
      .join(b, col("origin") === col("origin2") && col("dev") === col("dev2"))
      .select(col("dev"), col("c").as("c0"),
        expr(fd("1000000 * c1", "c")).as("fo"))
    val f = fBase(cum).select(col("dev").as("fdev"), col("n"), col("fm"))
    pair.join(broadcast(f), col("dev") === col("fdev"))
      .where(col("n") >= 2)
      .groupBy(col("dev"), col("n"), col("fm"))
      .agg(sum(col("c0") * (col("fo") - col("fm"))
        * (col("fo") - col("fm"))).as("t"))
      .select(col("dev").cast("long").as("dev"),
        col("n").cast("long").as("n_origins"),
        col("fm").cast("long").as("ldf_micro"),
        expr(fd("t", "(n - 1) * 1000000000000")).cast("long")
          .as("sigma2_cents"))
      .orderBy(col("dev"))
  }

  /** Bornhuetter-Ferguson: expected-loss prior from the OLDEST (fully
    * developed) origin's chain-ladder ultimate over its premium;
    * BF ultimate = latest + premium × ELR × %unreported, all in exact
    * scaled-integer arithmetic. */
  def q784: Q = Q(
    "q784_bornhuetter_ferguson",
    Some(s"""
      |WITH RECURSIVE ${sqlTri},${sqlF},${sqlWalk},${sqlPrem},
      |sides AS (
      |  SELECT l.origin, l.c0, p.prem, d.ult,
      |         1000000 - (1000000000000 // d.cdf) AS unrep
      |  FROM latest l JOIN devo d ON d.origin = l.origin
      |       JOIN prem p ON p.origin = l.origin),
      |elr AS (
      |  SELECT (1000000 * min_by(ult, origin)) // min_by(prem, origin)
      |           AS em
      |  FROM sides)
      |SELECT CAST(s.origin AS BIGINT) AS origin,
      |       CAST(s.prem AS BIGINT) AS premium_cents,
      |       CAST(s.unrep AS BIGINT) AS unreported_micro,
      |       CAST(e.em AS BIGINT) AS elr_prior_micro,
      |       CAST(s.c0 + (s.prem * e.em * s.unrep) // 1000000000000
      |            AS BIGINT) AS bf_ultimate_cents
      |FROM sides s CROSS JOIN elr e ORDER BY origin
      |""".stripMargin)) { (s, dir) =>
    val sides = walkBase(s, dir)
      .join(broadcast(premBase(s, dir)), Seq("origin"))
      .select(col("origin"), col("c0"), col("prem"), col("ult"),
        (lit(1000000) - expr(fd("1000000000000", "cdf"))).as("unrep"))
      .materialize()
    val elr = sides.agg(
      expr(fd("1000000 * min_by(ult, origin)", "min_by(prem, origin)"))
        .as("em"))
    sides.crossJoin(broadcast(elr))
      .select(col("origin").cast("long").as("origin"),
        col("prem").cast("long").as("premium_cents"),
        col("unrep").cast("long").as("unreported_micro"),
        col("em").cast("long").as("elr_prior_micro"),
        (col("c0") + expr(fd("prem * em * unrep", "1000000000000")))
          .cast("long").as("bf_ultimate_cents"))
      .orderBy(col("origin"))
  }

  /** Stanard-Bühlmann (Cape Cod): one pooled ELR over used-up premium
    * (premium × %reported), then BF-style ultimates with that single
    * decay-free prior. */
  def q785: Q = Q(
    "q785_cape_cod",
    Some(s"""
      |WITH RECURSIVE ${sqlTri},${sqlF},${sqlWalk},${sqlPrem},
      |sides AS (
      |  SELECT l.origin, l.c0, p.prem,
      |         1000000000000 // d.cdf AS rep,
      |         1000000 - (1000000000000 // d.cdf) AS unrep
      |  FROM latest l JOIN devo d ON d.origin = l.origin
      |       JOIN prem p ON p.origin = l.origin),
      |cc AS (
      |  SELECT (1000000 * sum(c0)) // sum((prem * rep) // 1000000) AS em
      |  FROM sides)
      |SELECT CAST(s.origin AS BIGINT) AS origin,
      |       CAST((s.prem * s.rep) // 1000000 AS BIGINT)
      |         AS usedup_premium_cents,
      |       CAST(c.em AS BIGINT) AS elr_cc_micro,
      |       CAST(s.c0 + (s.prem * c.em * s.unrep) // 1000000000000
      |            AS BIGINT) AS cc_ultimate_cents,
      |       CAST((s.prem * c.em * s.unrep) // 1000000000000 AS BIGINT)
      |         AS cc_ibnr_cents
      |FROM sides s CROSS JOIN cc c ORDER BY origin
      |""".stripMargin)) { (s, dir) =>
    val sides = walkBase(s, dir)
      .join(broadcast(premBase(s, dir)), Seq("origin"))
      .select(col("origin"), col("c0"), col("prem"),
        expr(fd("1000000000000", "cdf")).as("rep"),
        (lit(1000000) - expr(fd("1000000000000", "cdf"))).as("unrep"))
      .materialize()
    val cc = sides.agg(
      expr(fd("1000000 * sum(c0)",
        s"sum(${fd("prem * rep", "1000000")})")).as("em"))
    sides.crossJoin(broadcast(cc))
      .select(col("origin").cast("long").as("origin"),
        expr(fd("prem * rep", "1000000")).cast("long")
          .as("usedup_premium_cents"),
        col("em").cast("long").as("elr_cc_micro"),
        (col("c0") + expr(fd("prem * em * unrep", "1000000000000")))
          .cast("long").as("cc_ultimate_cents"),
        expr(fd("prem * em * unrep", "1000000000000")).cast("long")
          .as("cc_ibnr_cents"))
      .orderBy(col("origin"))
  }
}
