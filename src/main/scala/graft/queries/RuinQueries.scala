package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Materialize.MatOps
import graft.Tables

/** Round-10 ruin-theory wave: the classical surplus process
  * U_t = u₀ + c·t − S_t over the observed-day calendar, with claims =
  * daily RETURNED-line revenue (cents) and premium rate c = the
  * 10%-loaded mean daily claim (truncating integer). Faces: the
  * surplus-path audit, first-ruin times across initial-capital
  * barriers, the Lundberg-approximation bound, the claim-day profile,
  * and the severity of ruin at zero capital.
  *
  * Exactness: the whole path is integer cents (c is one truncating
  * division; cumulative sums are exact); the Lundberg adjustment
  * coefficient uses the classical small-R approximation R ≈ 2θm₁/m₂,
  * computed as the exact rational (10¹⁸·s₁) div (5·s₂) atto-units (θ = 1/10),
  * with e^{−Ru} as the one same-op-order double step. Barriers are
  * data-adaptive (multiples of the max daily claim), so every sf
  * exercises both ruin and survival.
  *
  * Scale: one fact scan to the day dim; all windows run over the
  * aggregated calendar-bounded series. */
object RuinQueries {

  val all: Seq[Q] = Seq(q1021, q1022, q1023, q1024, q1025)

  /** Claims series + surplus path CTEs: cs(t, cl), mo(n, tot, mx),
    * pr(c), sp(t, cum, u0path = c·t − cum). */
  private def sqlSp: String = """
    |day AS (SELECT CAST(l_shipdate AS DATE) AS dd,
    |               sum(CASE WHEN l_returnflag = 'R'
    |                   THEN CAST(l_extendedprice * 100 AS BIGINT)
    |                   ELSE 0 END) AS cl
    |        FROM lineitem GROUP BY 1),
    |cs AS (SELECT row_number() OVER (ORDER BY dd) AS t, cl FROM day),
    |mo AS (SELECT count(*) AS n, sum(cl) AS tot, max(cl) AS mx
    |       FROM cs),
    |pr AS (SELECT (11 * tot) // (10 * n) AS c FROM mo),
    |sp AS MATERIALIZED (
    |  SELECT t, cl,
    |         pr.c * t - sum(cl) OVER (ORDER BY t) AS net
    |  FROM cs CROSS JOIN pr)""".stripMargin

  /** Spark twin: (surplus path sp(t, cl, net), 1-row mo(n, tot, mx),
    * 1-row pr(c)). net = c·t − ΣS (ruin at capital u ⇔ net < −u). */
  private def spine(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val cs = Tables.lineitem(s, dir)
      .select(col("l_shipdate").cast("date").as("dd"),
        when(col("l_returnflag") === "R",
          expr("CAST(CAST(l_extendedprice * 100 AS DECIMAL(38,0))" +
            " AS LONG)")).otherwise(0L).as("v"))
      .groupBy(col("dd")).agg(sum(col("v")).as("cl"))
      .select(row_number().over(Window.orderBy(col("dd"))).as("t"),
        col("cl"))
      .materialize() // day-dim claims series
    val mo = cs.agg(count(lit(1)).as("n"), sum(col("cl")).as("tot"),
      max(col("cl")).as("mx")).materialize()
    val pr = mo.select(expr("(11 * tot) div (10 * n)").as("c"))
    val sp = cs.crossJoin(broadcast(pr))
      .select(col("t"), col("cl"),
        (col("c") * col("t")
          - sum(col("cl")).over(Window.orderBy(col("t")))).as("net"))
      .materialize()
    (sp, mo, pr)
  }

  /** Surplus-path audit at zero initial capital. */
  def q1021: Q = Q(
    "q1021_surplus_path",
    Some(s"""
      |WITH ${sqlSp}
      |SELECT CAST((SELECT c FROM pr) AS BIGINT) AS premium_cents_day,
      |       CAST(count(*) AS BIGINT) AS n_days,
      |       CAST(min(net) AS BIGINT) AS min_surplus_cents,
      |       CAST(max(net) AS BIGINT) AS max_surplus_cents,
      |       CAST(max_by(net, t) AS BIGINT) AS final_surplus_cents,
      |       CAST(sum(CASE WHEN net < 0 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_days_in_deficit
      |FROM sp
      |""".stripMargin)) { (s, dir) =>
    val (sp, _, pr) = spine(s, dir)
    sp.crossJoin(broadcast(pr))
      .agg(first(col("c")).as("premium_cents_day"),
        count(lit(1)).as("n_days"),
        min(col("net")).as("min_surplus_cents"),
        max(col("net")).as("max_surplus_cents"),
        max_by(col("net"), col("t")).as("final_surplus_cents"),
        sum(when(col("net") < 0, 1L).otherwise(0L))
          .as("n_days_in_deficit"))
      .select(col("premium_cents_day").cast("long"),
        col("n_days"), col("min_surplus_cents"),
        col("max_surplus_cents"),
        col("final_surplus_cents").cast("long"),
        col("n_days_in_deficit"))
  }

  /** First-ruin day across data-adaptive capital barriers
    * u ∈ {0, mx, 2mx, 4mx} (mx = max daily claim): NULL = survives. */
  def q1022: Q = Q(
    "q1022_ruin_barriers",
    Some(s"""
      |WITH ${sqlSp},
      |ub AS (SELECT m.k, m.k * mo.mx AS u FROM mo
      |       CROSS JOIN (SELECT * FROM (VALUES (0),(1),(2),(4)) v(k)) m)
      |SELECT CAST(ub.k AS BIGINT) AS barrier_mult,
      |       CAST(ub.u AS BIGINT) AS capital_cents,
      |       CAST(min(CASE WHEN sp.net < -ub.u THEN sp.t END) AS BIGINT)
      |         AS first_ruin_day,
      |       CAST(sum(CASE WHEN sp.net < -ub.u THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_ruin_days
      |FROM ub LEFT JOIN sp ON 1 = 1
      |GROUP BY 1, 2 ORDER BY barrier_mult
      |""".stripMargin)) { (s, dir) =>
    import s.implicits._
    val (sp, mo, _) = spine(s, dir)
    val ub = broadcast(Seq(0L, 1L, 2L, 4L).toDF("k")
      .crossJoin(broadcast(mo))
      .select(col("k"), (col("k") * col("mx")).as("u")))
    ub.join(sp, lit(true), "left_outer")
      .groupBy(col("k"), col("u"))
      .agg(min(when(col("net") < -col("u"), col("t")))
        .as("first_ruin_day"),
        sum(when(col("net") < -col("u"), 1L).otherwise(0L))
          .as("n_ruin_days"))
      .select(col("k").cast("long").as("barrier_mult"),
        col("u").cast("long").as("capital_cents"),
        col("first_ruin_day").cast("long").as("first_ruin_day"),
        col("n_ruin_days"))
      .orderBy(col("barrier_mult"))
  }

  /** Lundberg small-R approximation: R ≈ 2θm₁/m₂ as the exact
    * rational (10⁹·s₁) div (5·s₂), bounds e^{−R·u} in ppm. */
  def q1023: Q = Q(
    "q1023_lundberg_bound",
    Some(s"""
      |WITH ${sqlSp},
      |mm AS (SELECT sum(CAST(cl AS HUGEINT)) AS s1,
      |              sum(CAST(cl AS HUGEINT) * cl) AS s2,
      |              max(cl) AS mx
      |       FROM cs),
      |rr AS (SELECT (1000000000000000000 * s1) // (5 * s2) AS r_atto,
      |              mx FROM mm)
      |SELECT CAST(r_atto AS BIGINT) AS r_atto,
      |       CAST(floor(1000000.0 * exp(-(CAST(r_atto AS DOUBLE) / 1e18)
      |            * CAST(mx AS DOUBLE))) AS BIGINT) AS bound_u1_ppm,
      |       CAST(floor(1000000.0 * exp(-(CAST(r_atto AS DOUBLE) / 1e18)
      |            * 4.0 * CAST(mx AS DOUBLE))) AS BIGINT)
      |         AS bound_u4_ppm
      |FROM rr
      |""".stripMargin)) { (s, dir) =>
    val (sp, _, _) = spine(s, dir)
    sp.agg(sum(col("cl").cast("decimal(38,0)")).as("s1"),
        sum(expr("CAST(cl AS DECIMAL(38,0)) * cl")).as("s2"),
        max(col("cl")).as("mx"))
      .select(expr("(1000000000000000000 * s1) div (5 * s2)")
          .as("r_atto"), col("mx"))
      .select(col("r_atto").cast("long").as("r_atto"),
        expr("CAST(floor(1000000.0 * exp(-(CAST(r_atto AS DOUBLE) / 1e18)" +
          " * CAST(mx AS DOUBLE))) AS BIGINT)").as("bound_u1_ppm"),
        expr("CAST(floor(1000000.0 * exp(-(CAST(r_atto AS DOUBLE) / 1e18)" +
          " * 4.0 * CAST(mx AS DOUBLE))) AS BIGINT)").as("bound_u4_ppm"))
  }

  /** Claim-day profile: the 5 heaviest claim days with their share of
    * total claims and the surplus they left. */
  def q1024: Q = Q(
    "q1024_heaviest_claim_days",
    Some(s"""
      |WITH ${sqlSp}
      |SELECT CAST(sp.t AS BIGINT) AS t,
      |       CAST(sp.cl AS BIGINT) AS claim_cents,
      |       CAST((1000 * sp.cl) // mo.tot AS BIGINT) AS share_milli,
      |       CAST(sp.net AS BIGINT) AS surplus_after_cents
      |FROM sp CROSS JOIN mo
      |ORDER BY sp.cl DESC, sp.t LIMIT 5
      |""".stripMargin)) { (s, dir) =>
    val (sp, mo, _) = spine(s, dir)
    sp.crossJoin(broadcast(mo))
      .orderBy(col("cl").desc, col("t")).limit(5)
      .select(col("t").cast("long").as("t"),
        col("cl").cast("long").as("claim_cents"),
        expr("CAST((1000 * cl) div tot AS BIGINT)").as("share_milli"),
        col("net").cast("long").as("surplus_after_cents"))
  }

  /** Severity of ruin at zero capital: the first deficit excursion —
    * entry day, worst deficit, recovery day (NULL if never back up). */
  def q1025: Q = Q(
    "q1025_ruin_severity",
    Some(s"""
      |WITH ${sqlSp},
      |fr AS (SELECT min(t) AS t0 FROM sp WHERE net < 0),
      |rec AS (SELECT min(sp.t) AS t1 FROM sp CROSS JOIN fr
      |        WHERE sp.t > fr.t0 AND sp.net >= 0),
      |wd0 AS (SELECT min(sp.net) AS worst
      |        FROM sp CROSS JOIN fr CROSS JOIN rec
      |        WHERE sp.t >= fr.t0
      |          AND (rec.t1 IS NULL OR sp.t < rec.t1)),
      |-- scalar-subquery form: exactly ONE row even when no ruin ever
      |-- happens (a grouped aggregate over the empty excursion would
      |-- emit zero rows where the Spark global aggregate emits one)
      |wd AS (SELECT wd0.worst,
      |              (SELECT min(sp.t)
      |               FROM sp CROSS JOIN fr CROSS JOIN rec
      |               WHERE sp.t >= fr.t0
      |                 AND (rec.t1 IS NULL OR sp.t < rec.t1)
      |                 AND sp.net = wd0.worst) AS worst_t
      |       FROM wd0)
      |SELECT CAST(fr.t0 AS BIGINT) AS first_ruin_day,
      |       CAST(wd.worst AS BIGINT) AS worst_deficit_cents,
      |       CAST(wd.worst_t AS BIGINT) AS worst_deficit_day,
      |       CAST(rec.t1 AS BIGINT) AS recovery_day,
      |       CAST(rec.t1 - fr.t0 AS BIGINT) AS excursion_days
      |FROM fr CROSS JOIN rec CROSS JOIN wd
      |""".stripMargin)) { (s, dir) =>
    val (sp, _, _) = spine(s, dir)
    val fr = sp.where(col("net") < 0).agg(min(col("t")).as("t0"))
    val rec = sp.crossJoin(broadcast(fr))
      .where(col("t") > col("t0") && col("net") >= 0)
      .agg(min(col("t")).as("t1"))
    val exc = sp.crossJoin(broadcast(fr)).crossJoin(broadcast(rec))
      .where(col("t") >= col("t0") &&
        (col("t1").isNull || col("t") < col("t1")))
      .materialize() // deficit excursion, day-dim bounded
    val wd0 = exc.agg(min(col("net")).as("worst"))
    val wd = exc.crossJoin(broadcast(wd0))
      .agg(first(col("worst")).as("worst"),
        min(when(col("net") === col("worst"), col("t"))).as("worst_t"))
    fr.crossJoin(broadcast(rec)).crossJoin(broadcast(wd))
      .select(col("t0").cast("long").as("first_ruin_day"),
        col("worst").cast("long").as("worst_deficit_cents"),
        col("worst_t").cast("long").as("worst_deficit_day"),
        col("t1").cast("long").as("recovery_day"),
        (col("t1") - col("t0")).cast("long").as("excursion_days"))
  }
}
