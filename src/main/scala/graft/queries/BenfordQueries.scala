package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Round-11 digit-forensics wave on lineitem price cents — the
  * Benford battery beside the existing second-digit χ² (q558) and
  * cents-endings forensics (q1036-q1040): first-digit χ², the
  * Nigrini first-two-digit MAD, the mantissa arc test, the
  * summation test, and per-year Benford drift.
  *
  * Exactness: digits come from the BIGINT cents' decimal string
  * (identical in both engines); expected Benford masses and χ²/MAD
  * terms are micro-floored per cell from shared-text doubles before
  * order-free sums (NOTES: ln/log10 match bit-for-bit); the arc
  * test replaces per-row transcendentals with a 360-bin
  * driver-precomputed cos/sin micro table embedded as VALUES in
  * BOTH engines (the q1056 circular discipline) keyed by the
  * mantissa bin.
  *
  * Scale: every query is ONE lineitem scan projecting the price
  * column, aggregated by a ≤ 360-cell digit/bin dim — pure
  * map-side-combine group-bys, no joins against the fact. */
object BenfordQueries {

  val all: Seq[Q] = Seq(q1141, q1142, q1143, q1144, q1145)

  /** Oracle cents CTE vc(v) (positive BIGINT cents). */
  private def sqlVc: String = """
    |vc AS (SELECT CAST(l_extendedprice * 100 AS BIGINT) AS v
    |       FROM lineitem)""".stripMargin

  private def vc(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(expr("CAST(CAST(l_extendedprice * 100 AS DECIMAL(38,0))" +
        " AS LONG)").as("v"))

  /** SpineCache (year, first-two-digit) histogram — ONE lineitem
    * pass feeding q1141/q1142/q1144/q1145 (counts + exact value
    * sums; ≤ 90·years rows). The oracles keep inline scans, so the
    * gate proves spine ≡ scratch. */
  private def digitHist(s: SparkSession, dir: String): DataFrame =
    graft.sources.SpineCache.table(s, dir, "digit_hist",
      Seq("lineitem")) {
      Tables.lineitem(s, dir)
        .select(year(col("l_shipdate").cast("date")).as("y"),
          expr("CAST(CAST(l_extendedprice * 100 AS DECIMAL(38,0))" +
            " AS LONG)").as("v"))
        .groupBy(col("y"),
          expr("CAST(left(CAST(v AS STRING), 2) AS BIGINT)").as("d2"))
        .agg(count(lit(1)).as("c"),
          expr("sum(CAST(v AS DECIMAL(19,0)))").as("sv"))
    }

  /** SpineCache 360-bin mantissa histogram for q1143. */
  private def mantissaHist(s: SparkSession, dir: String): DataFrame =
    graft.sources.SpineCache.table(s, dir, "mantissa_hist",
      Seq("lineitem")) {
      vc(s, dir)
        .groupBy(expr("CAST(floor(360.0 * (log10(CAST(v AS DOUBLE))" +
          " - floor(log10(CAST(v AS DOUBLE))))) AS BIGINT)").as("bg"))
        .agg(count(lit(1)).as("c"))
    }

  /** First-digit χ² against Benford: per-digit observed counts,
    * expected milli-counts, and the pooled χ² (per-digit terms
    * micro-floored). */
  def q1141: Q = {
    val exp = "(CAST(n AS DOUBLE) * log10(1.0 + 1.0 / CAST(d AS DOUBLE)))"
    val term = s"(CAST(c AS DOUBLE) - $exp) * (CAST(c AS DOUBLE) - $exp)" +
      s" / $exp"
    Q("q1141_benford_first_digit",
      Some(s"""
        |WITH ${sqlVc},
        |dg AS (SELECT CAST(left(CAST(v AS VARCHAR), 1) AS BIGINT) AS d,
        |              count(*) AS c
        |       FROM vc GROUP BY 1),
        |nn AS (SELECT sum(c) AS n FROM dg),
        |tm AS (SELECT d, c, CAST(floor(1000.0 * $exp) AS BIGINT)
        |           AS exp_milli,
        |         CAST(floor(1000000.0 * $term) AS BIGINT) AS t
        |       FROM dg CROSS JOIN nn)
        |SELECT CAST(d AS BIGINT) AS digit, CAST(c AS BIGINT) AS observed,
        |       CAST(exp_milli AS BIGINT) AS expected_milli,
        |       CAST(sum(t) OVER () // 1000 AS BIGINT) AS chi2_milli
        |FROM tm ORDER BY digit
        |""".stripMargin)) { (s, dir) =>
      val dg = digitHist(s, dir)
        .groupBy(expr("d2 div 10").as("d"))
        .agg(sum(col("c")).as("c"))
      val nn = dg.agg(sum(col("c")).as("n"))
      dg.crossJoin(broadcast(nn))
        .select(col("d"), col("c"),
          expr(s"CAST(floor(1000.0 * $exp) AS BIGINT)").as("exp_milli"),
          expr(s"CAST(floor(1000000.0 * $term) AS BIGINT)").as("t"))
        .select(col("d").as("digit"), col("c").as("observed"),
          col("exp_milli").as("expected_milli"),
          expr("CAST(t AS BIGINT)").as("t"))
        .withColumn("chi2_milli",
          expr("CAST(sum(t) OVER () div 1000 AS BIGINT)"))
        .drop("t")
        .orderBy(col("digit"))
    }
  }

  /** Nigrini first-two-digit MAD: mean |p_obs − p_benford| over the
    * 90 cells (absent cells count with p_obs = 0, via the
    * generated 10..99 dim). */
  def q1142: Q = {
    val pben = "(log10(1.0 + 1.0 / CAST(d2 AS DOUBLE)))"
    val dev = s"(abs(CAST(c AS DOUBLE) / CAST(n AS DOUBLE) - $pben))"
    Q("q1142_benford_two_digit_mad",
      Some(s"""
        |WITH ${sqlVc},
        |dg AS (SELECT CAST(left(CAST(v AS VARCHAR), 2) AS BIGINT) AS d2,
        |              count(*) AS c
        |       FROM vc GROUP BY 1),
        |nn AS (SELECT sum(c) AS n FROM dg),
        |cells AS (SELECT * FROM (VALUES ${(10 to 99).map(x => s"($x)").mkString(",")}) v(d2)),
        |fl AS (SELECT cells.d2, coalesce(dg.c, 0) AS c
        |       FROM cells LEFT JOIN dg ON dg.d2 = cells.d2),
        |tm AS (SELECT fl.d2,
        |         CAST(floor(1000000000.0 * $dev) AS BIGINT) AS t,
        |         CASE WHEN fl.c > 0 THEN 1 ELSE 0 END AS pres
        |       FROM fl CROSS JOIN nn)
        |SELECT CAST(count(*) AS BIGINT) AS n_cells,
        |       CAST(sum(pres) AS BIGINT) AS cells_present,
        |       CAST(sum(t) // count(*) // 1000 AS BIGINT) AS mad_micro
        |FROM tm
        |""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val dg = digitHist(s, dir)
        .groupBy(col("d2").as("d2g"))
        .agg(sum(col("c")).as("cg"))
      val nn = dg.agg(sum(col("cg")).as("n"))
      val cells = broadcast((10 to 99).toDF("d2"))
      cells.join(dg, col("d2g") === col("d2"), "left_outer")
        .select(col("d2"), coalesce(col("cg"), lit(0L)).as("c"))
        .crossJoin(broadcast(nn))
        .select(
          expr(s"CAST(floor(1000000000.0 * $dev) AS BIGINT)").as("t"),
          when(col("c") > 0, 1L).otherwise(0L).as("pres"))
        .agg(count(lit(1)).as("n_cells"), sum(col("pres")).as("cp"),
          sum(col("t")).as("st"))
        .select(col("n_cells").cast("long").as("n_cells"),
          col("cp").cast("long").as("cells_present"),
          expr("CAST(st div n_cells div 1000 AS BIGINT)").as("mad_micro"))
    }
  }

  /** 360-bin driver-precomputed cos/sin micro table for bin centers
    * θ = 2π·(bin + 0.5)/360 (the q1056 circular discipline). */
  private def wtab: Seq[(Int, Long, Long)] = (0 until 360).map { b =>
    val th = 2.0 * math.Pi * (b + 0.5) / 360.0
    (b, math.floor(math.cos(th) * 1000000).toLong,
      math.floor(math.sin(th) * 1000000).toLong)
  }

  /** Mantissa arc test: bin = floor(360·frac(log10 v)), resultant
    * (X̄, Ȳ) from the embedded weight table, arc statistic n·L². */
  def q1143: Q = {
    val sqlW = "w(b, wc, ws) AS (VALUES " +
      wtab.map { case (b, c, sn) => s"($b, $c, $sn)" }.mkString(", ") + ")"
    val l2 = "((CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0)" +
      " * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0)" +
      " + (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0)" +
      " * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0))"
    Q("q1143_mantissa_arc_test",
      Some(s"""
        |WITH ${sqlVc},
        |${sqlW},
        |bn AS (SELECT CAST(floor(360.0 * (log10(CAST(v AS DOUBLE))
        |           - floor(log10(CAST(v AS DOUBLE))))) AS BIGINT) AS b,
        |         count(*) AS c
        |       FROM vc GROUP BY 1),
        |mo AS (SELECT sum(bn.c) AS n, sum(bn.c * w.wc) AS sx,
        |              sum(bn.c * w.ws) AS sy
        |       FROM bn JOIN w ON w.b = bn.b)
        |SELECT CAST(n AS BIGINT) AS n_values,
        |       CAST(sx // n AS BIGINT) AS mean_cos_micro,
        |       CAST(sy // n AS BIGINT) AS mean_sin_micro,
        |       CAST(floor(CAST(n AS DOUBLE) * $l2) AS BIGINT) AS arc_stat
        |FROM mo
        |""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val w = broadcast(wtab.toDF("b", "wc", "ws"))
      val bn = mantissaHist(s, dir)
      bn.join(w, col("b") === col("bg"))
        .agg(sum(col("c")).as("n"),
          sum(col("c") * col("wc")).as("sx"),
          sum(col("c") * col("ws")).as("sy"))
        .select(col("n").cast("long").as("n_values"),
          expr("CAST(sx div n AS BIGINT)").as("mean_cos_micro"),
          expr("CAST(sy div n AS BIGINT)").as("mean_sin_micro"),
          expr(s"CAST(floor(CAST(n AS DOUBLE) * $l2) AS BIGINT)")
            .as("arc_stat"))
    }
  }

  /** Summation test: value share per first-two-digit cell should be
    * near-uniform under Benford; extremes and spread in ppm. */
  def q1144: Q = Q(
    "q1144_summation_test",
    Some(s"""
      |WITH ${sqlVc},
      |dg AS (SELECT CAST(left(CAST(v AS VARCHAR), 2) AS BIGINT) AS d2,
      |              sum(CAST(v AS DECIMAL(19,0))) AS sv
      |       FROM vc GROUP BY 1),
      |tt AS (SELECT sum(sv) AS tot, count(*) AS cells FROM dg),
      |sh AS (SELECT d2, CAST(floor(1000000.0 * CAST(sv AS DOUBLE)
      |           / CAST(tot AS DOUBLE)) AS BIGINT) AS ppm
      |       FROM dg CROSS JOIN tt)
      |SELECT CAST(max(cells) AS BIGINT) AS n_cells,
      |       CAST(min(ppm) AS BIGINT) AS min_share_ppm,
      |       CAST(max(ppm) AS BIGINT) AS max_share_ppm,
      |       CAST(min(CASE WHEN ppm = (SELECT max(ppm) FROM sh)
      |            THEN d2 END) AS BIGINT) AS argmax_cell,
      |       CAST(11111 AS BIGINT) AS uniform_ppm
      |FROM sh CROSS JOIN tt
      |""".stripMargin)) { (s, dir) =>
    val dg = digitHist(s, dir)
      .groupBy(col("d2"))
      .agg(sum(col("sv")).as("sv"))
    val tt = dg.agg(sum(col("sv")).as("tot"), count(lit(1)).as("cells"))
    val sh = dg.crossJoin(broadcast(tt))
      .select(col("d2"),
        expr("CAST(floor(1000000.0 * CAST(sv AS DOUBLE)" +
          " / CAST(tot AS DOUBLE)) AS BIGINT)").as("ppm"))
    val mx = sh.agg(max(col("ppm")).as("mxp"))
    val am = sh.crossJoin(broadcast(mx))
      .where(col("ppm") === col("mxp"))
      .agg(min(col("d2")).as("argmax_cell"))
    sh.agg(min(col("ppm")).as("mn"), max(col("ppm")).as("mx2"))
      .crossJoin(broadcast(tt)).crossJoin(broadcast(am))
      .select(col("cells").cast("long").as("n_cells"),
        col("mn").as("min_share_ppm"), col("mx2").as("max_share_ppm"),
        col("argmax_cell").cast("long").as("argmax_cell"),
        lit(11111L).as("uniform_ppm"))
  }

  /** Per-ship-year Benford drift: first-digit χ² and MAD per year
    * (per-cell terms micro-floored; absent digits impossible here —
    * every year has all 9 leading digits at any sf, asserted by the
    * 9-row-per-year shape the oracle compares). */
  def q1145: Q = {
    val exp = "(CAST(n AS DOUBLE) * log10(1.0 + 1.0 / CAST(d AS DOUBLE)))"
    val term = s"((CAST(c AS DOUBLE) - $exp) * (CAST(c AS DOUBLE) - $exp)" +
      s" / $exp)"
    val dev = "(abs(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)" +
      " - log10(1.0 + 1.0 / CAST(d AS DOUBLE))))"
    Q("q1145_benford_yearly_drift",
      Some(s"""
        |WITH yv AS (SELECT year(CAST(l_shipdate AS DATE)) AS y,
        |              CAST(l_extendedprice * 100 AS BIGINT) AS v
        |            FROM lineitem),
        |dg AS (SELECT y, CAST(left(CAST(v AS VARCHAR), 1) AS BIGINT) AS d,
        |              count(*) AS c
        |       FROM yv GROUP BY 1, 2),
        |nn AS (SELECT y, sum(c) AS n FROM dg GROUP BY 1),
        |tm AS (SELECT dg.y,
        |         CAST(floor(1000000.0 * $term) AS BIGINT) AS t,
        |         CAST(floor(1000000000.0 * $dev) AS BIGINT) AS dv
        |       FROM dg JOIN nn ON nn.y = dg.y)
        |SELECT CAST(y AS BIGINT) AS ship_year,
        |       CAST(count(*) AS BIGINT) AS n_digits,
        |       CAST(sum(t) // 1000 AS BIGINT) AS chi2_milli,
        |       CAST(sum(dv) // count(*) // 1000 AS BIGINT) AS mad_micro
        |FROM tm GROUP BY 1 ORDER BY ship_year
        |""".stripMargin)) { (s, dir) =>
      val dg = digitHist(s, dir)
        .groupBy(col("y"), expr("d2 div 10").as("d"))
        .agg(sum(col("c")).as("c"))
      val nn = dg.groupBy(col("y").as("yn"))
        .agg(sum(col("c")).as("n"))
      dg.join(broadcast(nn), col("yn") === col("y"))
        .select(col("y"),
          expr(s"CAST(floor(1000000.0 * $term) AS BIGINT)").as("t"),
          expr(s"CAST(floor(1000000000.0 * $dev) AS BIGINT)").as("dv"))
        .groupBy(col("y"))
        .agg(count(lit(1)).as("nd"), sum(col("t")).as("st"),
          sum(col("dv")).as("sdv"))
        .select(col("y").cast("long").as("ship_year"),
          col("nd").cast("long").as("n_digits"),
          expr("CAST(st div 1000 AS BIGINT)").as("chi2_milli"),
          expr("CAST(sdv div nd div 1000 AS BIGINT)").as("mad_micro"))
        .orderBy(col("ship_year"))
    }
  }
}
