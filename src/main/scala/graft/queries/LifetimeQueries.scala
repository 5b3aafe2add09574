package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-8 lifetime wave: the records (running-maxima) test, a hash
  * bucket birthday-collision audit, AQL acceptance-sampling replay,
  * the logistic probability-plot correlation, and the mean residual
  * life curve. Day-dim windows are calendar-bounded; the lot
  * sampling rides month-partitioned ranks. */
object LifetimeQueries {

  val all: Seq[Q] = Seq(q641, q642, q643, q644, q645)

  /** Records test on daily net revenue: count days that set a new
    * running maximum; under exchangeability E = Σ 1/i and
    * Var = Σ(1/i − 1/i²) (harmonic sums over the day-index dim,
    * DECIMAL(18,9)-quantized so both engines sum the identical
    * terms). Too many records ⇒ drift; the rank-based trend check
    * that needs no values, only comparisons. */
  def q641: Q = Q(
    "q641_records_test",
    Some(s"""
      |WITH ${DailyNet.sql.stripPrefix("\n")},
      |w AS (
      |  SELECT net,
      |         max(net) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
      |           PRECEDING AND 1 PRECEDING) AS prevmax
      |  FROM d),
      |rc AS (SELECT count(*) AS n_rec FROM w
      |       WHERE prevmax IS NULL OR net > prevmax),
      |nn AS (SELECT count(*) AS n FROM d),
      |hs AS (
      |  SELECT sum(CAST(1.0 / i AS DECIMAL(18,9))) AS e_rec,
      |         sum(CAST(1.0 / i - 1.0 / (CAST(i AS DOUBLE) * i)
      |             AS DECIMAL(18,9))) AS v_rec
      |  FROM (SELECT unnest(range(1, (SELECT n FROM nn) + 1)) AS i))
      |SELECT CAST(nn.n AS BIGINT) AS n_days,
      |       CAST(rc.n_rec AS BIGINT) AS n_records,
      |       CAST(floor(CAST(hs.e_rec AS DOUBLE) * 1000.0) AS BIGINT)
      |         AS expected_milli,
      |       CAST(floor((CAST(rc.n_rec AS DOUBLE)
      |           - CAST(hs.e_rec AS DOUBLE))
      |           * (CAST(rc.n_rec AS DOUBLE) - CAST(hs.e_rec AS DOUBLE))
      |         / CAST(hs.v_rec AS DOUBLE) * 1000.0) AS BIGINT)
      |         AS z2_milli
      |FROM rc CROSS JOIN nn CROSS JOIN hs
      |""".stripMargin)) { (s, dir) =>
    val d = DailyNet.frame(s, dir).materialize()
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val rc = d.withColumn("prevmax", max(col("net")).over(w))
      .where(col("prevmax").isNull || col("net") > col("prevmax"))
      .agg(count(lit(1)).as("n_rec"))
    val nn = d.agg(count(lit(1)).as("n"))
    val hs = nn.select(explode(expr("sequence(1, n)")).as("i"))
      .agg(sum(expr("CAST(1.0 / i AS DECIMAL(18,9))")).as("e_rec"),
        sum(expr("CAST(1.0 / i - 1.0 / (CAST(i AS DOUBLE) * i)" +
          " AS DECIMAL(18,9))")).as("v_rec"))
    rc.crossJoin(broadcast(nn)).crossJoin(broadcast(hs))
      .select(col("n").as("n_days"), col("n_rec").as("n_records"),
        expr("CAST(floor(CAST(e_rec AS DOUBLE) * 1000.0) AS BIGINT)")
          .as("expected_milli"),
        expr("CAST(floor((CAST(n_rec AS DOUBLE) - CAST(e_rec AS DOUBLE))" +
          " * (CAST(n_rec AS DOUBLE) - CAST(e_rec AS DOUBLE))" +
          " / CAST(v_rec AS DOUBLE) * 1000.0) AS BIGINT)").as("z2_milli"))
  }

  /** Birthday-collision audit of a 4,096-bucket LCG hash of order
    * keys: observed colliding pairs Σ c(c−1)/2 against the uniform
    * expectation n(n−1)/2m — the load-balance sanity check run before
    * trusting any hash-partitioned layout. Pure integer arithmetic
    * (LCG constants sized so products stay ≪ 2⁶³). */
  def q642: Q = Q(
    "q642_hash_collision_audit",
    Some("""
      |WITH h AS (
      |  SELECT ((o_orderkey * 1103515245 + 12345) % 2147483648) % 4096
      |           AS b
      |  FROM orders),
      |bc AS (SELECT b, count(*) AS c FROM h GROUP BY 1),
      |ag AS (
      |  SELECT sum(c) AS n, count(*) AS used,
      |         sum(c * (c - 1) // 2) AS obs
      |  FROM bc)
      |SELECT CAST(n AS BIGINT) AS n_keys,
      |       CAST(used AS BIGINT) AS n_buckets_used,
      |       CAST(obs AS BIGINT) AS observed_pairs,
      |       CAST(n * (n - 1) // (2 * 4096) AS BIGINT) AS expected_pairs,
      |       CAST(floor(CAST(obs AS DOUBLE)
      |         / (CAST(n AS DOUBLE) * (n - 1) / (2.0 * 4096))
      |         * 1000.0) AS BIGINT) AS ratio_milli
      |FROM ag
      |""".stripMargin)) { (s, dir) =>
    val h = Tables.orders(s, dir)
      .select(expr("((o_orderkey * 1103515245 + 12345) % 2147483648)" +
        " % 4096").as("b"))
    val bc = h.groupBy(col("b")).agg(count(lit(1)).as("c"))
    bc.agg(sum(col("c")).as("n"), count(lit(1)).as("used"),
        sum(expr("c * (c - 1) div 2")).as("obs"))
      .select(col("n").as("n_keys"), col("used").as("n_buckets_used"),
        col("obs").as("observed_pairs"),
        expr("n * (n - 1) div (2 * 4096)").as("expected_pairs"),
        expr("CAST(floor(CAST(obs AS DOUBLE)" +
          " / (CAST(n AS DOUBLE) * (n - 1) / (2.0 * 4096))" +
          " * 1000.0) AS BIGINT)").as("ratio_milli"))
  }

  /** AQL acceptance-sampling replay (n = 50, c = 2) over monthly
    * lineitem "lots": inspect the first 50 lines by arrival order,
    * accept when ≤ 2 are returned, and compare the TRUE defect rate
    * of accepted vs rejected lots — the operating-characteristic
    * audit of the plan on real lots. Month-partitioned ranks only. */
  def q643: Q = Q(
    "q643_acceptance_sampling",
    Some("""
      |WITH l AS (
      |  SELECT year(l_shipdate) * 12 + month(l_shipdate) AS mo,
      |         l_orderkey AS ok, l_linenumber AS ln,
      |         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS def
      |  FROM lineitem),
      |rk AS (
      |  SELECT mo, def,
      |         row_number() OVER (PARTITION BY mo ORDER BY ok, ln) AS rn
      |  FROM l),
      |lot AS (
      |  SELECT mo, count(*) AS n_lines, sum(def) AS n_def,
      |         sum(CASE WHEN rn <= 50 THEN def ELSE 0 END) AS smp_def,
      |         sum(CASE WHEN rn <= 50 THEN 1 ELSE 0 END) AS smp_n
      |  FROM rk GROUP BY 1),
      |dec AS (
      |  SELECT mo, n_lines, n_def,
      |         CASE WHEN smp_n >= 50 AND smp_def <= 2 THEN 1 ELSE 0 END
      |           AS accepted
      |  FROM lot WHERE smp_n >= 50)
      |SELECT CAST(count(*) AS BIGINT) AS n_lots,
      |       CAST(sum(accepted) AS BIGINT) AS n_accepted,
      |       CAST((1000000 * sum(CASE WHEN accepted = 1 THEN n_def
      |              ELSE 0 END))
      |            // greatest(sum(CASE WHEN accepted = 1 THEN n_lines
      |              ELSE 0 END), 1) AS BIGINT) AS accepted_rate_ppm,
      |       CAST((1000000 * sum(CASE WHEN accepted = 0 THEN n_def
      |              ELSE 0 END))
      |            // greatest(sum(CASE WHEN accepted = 0 THEN n_lines
      |              ELSE 0 END), 1) AS BIGINT) AS rejected_rate_ppm
      |FROM dec
      |""".stripMargin)) { (s, dir) =>
    val l = Tables.lineitem(s, dir)
      .select((year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
        .as("mo"), col("l_orderkey").as("ok"),
        col("l_linenumber").as("ln"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("def"))
    val rk = l.withColumn("rn", row_number().over(
      Window.partitionBy(col("mo")).orderBy(col("ok"), col("ln"))))
    val dec = rk.groupBy(col("mo"))
      .agg(count(lit(1)).as("n_lines"), sum(col("def")).as("n_def"),
        sum(when(col("rn") <= 50, col("def")).otherwise(0L))
          .as("smp_def"),
        sum(when(col("rn") <= 50, 1L).otherwise(0L)).as("smp_n"))
      .where(col("smp_n") >= 50)
      .withColumn("accepted",
        when(col("smp_def") <= 2, 1L).otherwise(0L))
    dec.agg(count(lit(1)).as("n_lots"),
        sum(col("accepted")).as("n_accepted"),
        sum(when(col("accepted") === 1, col("n_def")).otherwise(0L))
          .as("adef"),
        sum(when(col("accepted") === 1, col("n_lines")).otherwise(0L))
          .as("an"),
        sum(when(col("accepted") === 0, col("n_def")).otherwise(0L))
          .as("rdef"),
        sum(when(col("accepted") === 0, col("n_lines")).otherwise(0L))
          .as("rn_"))
      .select(col("n_lots"), col("n_accepted"),
        expr("(1000000 * adef) div greatest(an, 1)")
          .as("accepted_rate_ppm"),
        expr("(1000000 * rdef) div greatest(rn_, 1)")
          .as("rejected_rate_ppm"))
  }

  /** Logistic probability-plot correlation (PPCC): correlation of the
    * day-ranked daily net values against the logistic scores
    * ln(i/(n+1−i)) (DECIMAL(18,9)-quantized so both engines sum the
    * same terms). Near 1 ⇒ the logistic's heavier-than-normal tails
    * fit; the distribution-choice diagnostic behind q612's JB
    * verdict. Rank runs over the calendar-bounded day dim. */
  def q644: Q = Q(
    "q644_logistic_ppcc",
    Some(s"""
      |WITH ${DailyNet.sql.stripPrefix("\n")},
      |rk AS (
      |  SELECT net AS v,
      |         row_number() OVER (ORDER BY net, day) AS i,
      |         count(*) OVER () AS n
      |  FROM d),
      |sc AS (
      |  SELECT v, CAST(ln(CAST(i AS DOUBLE) / (n + 1 - i))
      |            AS DECIMAL(18,9)) AS s
      |  FROM rk),
      |mo AS (
      |  SELECT count(*) AS n, sum(v) AS sv, sum(s) AS ss,
      |         sum(v * v) AS qv, sum(s * s) AS qs, sum(v * s) AS qvs
      |  FROM sc)
      |SELECT CAST(n AS BIGINT) AS n_days,
      |       CAST(floor((CAST(n AS DOUBLE) * CAST(qvs AS DOUBLE)
      |           - CAST(sv AS DOUBLE) * CAST(ss AS DOUBLE))
      |         / sqrt(CAST(n AS DOUBLE) * CAST(qv AS DOUBLE)
      |             - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
      |         / sqrt(CAST(n AS DOUBLE) * CAST(qs AS DOUBLE)
      |             - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE))
      |         * 1000000.0) AS BIGINT) AS ppcc_micro
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    val d = DailyNet.frame(s, dir)
    // day dim — calendar-bounded, the global rank is legal here
    val rk = d.select(col("net").as("v"),
        row_number().over(Window.orderBy(col("net"), col("day"))).as("i"))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy()))
    val sc = rk.select(col("v"),
      expr("CAST(ln(CAST(i AS DOUBLE) / (n + 1 - i)) AS DECIMAL(18,9))")
        .as("s"))
    sc.agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        sum(col("s")).as("ss"), sum(col("v") * col("v")).as("qv"),
        sum(col("s") * col("s")).as("qs"),
        sum(col("v") * col("s")).as("qvs"))
      .select(col("n").as("n_days"),
        expr("CAST(floor((CAST(n AS DOUBLE) * CAST(qvs AS DOUBLE)" +
          " - CAST(sv AS DOUBLE) * CAST(ss AS DOUBLE))" +
          " / sqrt(CAST(n AS DOUBLE) * CAST(qv AS DOUBLE)" +
          " - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))" +
          " / sqrt(CAST(n AS DOUBLE) * CAST(qs AS DOUBLE)" +
          " - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE))" +
          " * 1000000.0) AS BIGINT)").as("ppcc_micro"))
  }

  /** Mean residual life of positive first-ship leads on a 90-day
    * grid: MRL(t) = E[T − t | T > t] from exact suffix sums over the
    * calendar-bounded lead-day dim — rising MRL exposes the
    * heavy-tail "the longer it's open, the longer it'll stay open"
    * regime the q573 inspection paradox feeds on. */
  def q645: Q = Q(
    "q645_mean_residual_life",
    Some("""
      |WITH lead AS (
      |  SELECT epoch_us(min(l.l_shipdate)) // 86400000000
      |           - epoch_us(any_value(o.o_orderdate)) // 86400000000 AS t
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |  GROUP BY o.o_orderkey),
      |pos AS (SELECT t FROM lead WHERE t >= 1),
      |dd AS (SELECT t, count(*) AS c, sum(t) AS st FROM pos GROUP BY 1),
      |grid AS (SELECT unnest(range(0, 9)) * 90 AS g),
      |mrl AS (
      |  SELECT grid.g, sum(dd.c) AS n_at_risk, sum(dd.st) AS tsum
      |  FROM grid JOIN dd ON dd.t > grid.g
      |  GROUP BY 1)
      |SELECT CAST(g AS BIGINT) AS t_days,
      |       CAST(n_at_risk AS BIGINT) AS n_at_risk,
      |       CAST(floor(CAST(tsum AS DOUBLE) / CAST(n_at_risk AS DOUBLE)
      |         - g) AS BIGINT) AS mrl_days
      |FROM mrl ORDER BY t_days
      |""".stripMargin)) { (s, dir) =>
    val pos = Tables.orders(s, dir)
      .select(col("o_orderkey").as("id"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))" +
          " div 86400000000").as("od"))
      .join(Tables.lineitem(s, dir).select(col("l_orderkey"),
        expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))" +
          " div 86400000000").as("sd")),
        col("id") === col("l_orderkey"))
      .groupBy(col("id"), col("od")).agg(min(col("sd")).as("fs"))
      .select((col("fs") - col("od")).as("t"))
      .where(col("t") >= 1)
    val dd = pos.groupBy(col("t"))
      .agg(count(lit(1)).as("c"), sum(col("t")).as("st"))
      .materialize() // the 9 grid probes all read the day dim
    val grid = {
      import s.implicits._
      (0 until 9).map(i => i.toLong * 90).toDF("g")
    }
    dd.join(broadcast(grid), col("t") > col("g"))
      .groupBy(col("g"))
      .agg(sum(col("c")).as("n_at_risk"), sum(col("st")).as("tsum"))
      .select(col("g").as("t_days"), col("n_at_risk"),
        expr("CAST(floor(CAST(tsum AS DOUBLE) / CAST(n_at_risk AS DOUBLE)" +
          " - g) AS BIGINT)").as("mrl_days"))
      .orderBy(col("t_days"))
  }
}
