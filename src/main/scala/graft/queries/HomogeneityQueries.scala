package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps

/** Round-9 homogeneity / change-point battery over the shared signed
  * daily-net series (DailyNet): Pettitt's test, the standard normal
  * homogeneity test (SNHT), Buishand's range, the von Neumann ratio
  * and Bartels' rank version — the classical "is this series one
  * regime" checks next to the suite's CUSUM/Page-Hinkley detectors.
  * Everything reduces to exact integer prefix sums / doubled midranks
  * on the ~2.5k-observed-day CALENDAR dim (the one singleton-partition
  * window the house rules allow); per-t statistics that need a final
  * ratio go through pinned doubles computed identically from exact
  * integers on both engines. */
object HomogeneityQueries {

  val all: Seq[Q] = Seq(q711, q712, q713, q714, q715)

  /** Oracle CTEs: `d(day, net)` from DailyNet, then `o(t, day, net)`
    * with the 1-based time index in day order. */
  private def sqlSeries: String = DailyNet.sql + """,
    |o AS (
    |  SELECT row_number() OVER (ORDER BY day) AS t, day, net FROM d)""".stripMargin

  private def series(s: SparkSession, dir: String): DataFrame =
    DailyNet.frame(s, dir)
      .withColumn("t", row_number().over(Window.orderBy(col("day"))))

  /** Pettitt change-point test: U_t = Σ_{i≤t}Σ_{j>t} sgn(x_i−x_j),
    * computed exactly via the midrank identity U_t = Σ_{i≤t}D_i −
    * t(n+1) with doubled midranks D = 2·rank + ties − 1 (never a pair
    * join). K = max|U_t|, split day = argmax, p ≈ 2exp(−6K²/(n³+n²)). */
  def q711: Q = Q(
    "q711_pettitt_test",
    Some(s"""
      |WITH ${sqlSeries},
      |rk AS (
      |  SELECT t, day,
      |         2 * rank() OVER (ORDER BY net)
      |           + count(*) OVER (PARTITION BY net) - 1 AS dd
      |  FROM o),
      |u AS (
      |  SELECT t, day,
      |         sum(dd) OVER (ORDER BY t) - t * ((SELECT count(*) FROM o)
      |           + 1) AS ut,
      |         (SELECT count(*) FROM o) AS n
      |  FROM rk),
      |pick AS (
      |  SELECT n, abs(ut) AS k, day
      |  FROM u WHERE t < n ORDER BY abs(ut) DESC, day LIMIT 1)
      |SELECT CAST(n AS BIGINT) AS n_days, CAST(k AS BIGINT) AS k_stat,
      |       CAST(day AS BIGINT) AS split_day,
      |       CAST(floor(2000000.0 * exp(-6.0 * CAST(k AS DOUBLE) * k
      |            / (CAST(n AS DOUBLE) * n * n
      |               + CAST(n AS DOUBLE) * n))) AS BIGINT) AS p_micro
      |FROM pick
      |""".stripMargin)) { (s, dir) =>
    val o = series(s, dir).materialize() // observed-day dim
    val rk = o.withColumn("dd",
      lit(2) * rank().over(Window.orderBy(col("net")))
        + count(lit(1)).over(Window.partitionBy(col("net"))) - 1)
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(lit(1))))
    rk.withColumn("ut",
        sum(col("dd")).over(Window.orderBy(col("t")))
          - col("t") * (col("n") + 1))
      .where(col("t") < col("n"))
      .select(col("n").cast("long").as("n_days"),
        abs(col("ut")).cast("long").as("k_stat"),
        col("day").cast("long").as("split_day"))
      .orderBy(col("k_stat").desc, col("split_day"))
      .limit(1)
      .select(col("n_days"), col("k_stat"), col("split_day"),
        expr("CAST(floor(2000000.0 * exp(-6.0 * CAST(k_stat AS DOUBLE)" +
          " * k_stat / (CAST(n_days AS DOUBLE) * n_days * n_days" +
          " + CAST(n_days AS DOUBLE) * n_days))) AS BIGINT)")
          .as("p_micro"))
  }

  /** SNHT (Alexandersson): T_t = t·z̄₁² + (n−t)·z̄₂². With A_t =
    * n·S_t − t·S_n (exact int) and V = n·Σx² − S_n² (exact int),
    * T_t = n·A_t²/(t(n−t)·V) — evaluated as one pinned double ratio
    * per t. Net is rescaled to whole dollars first for A_t² headroom. */
  def q712: Q = Q(
    "q712_snht",
    Some(s"""
      |WITH ${sqlSeries},
      |v AS (SELECT t, day, net // 100 AS x FROM o),
      |tot AS (SELECT count(*) AS n, sum(x) AS sx,
      |               sum(CAST(x AS HUGEINT) * x) AS sxx FROM v),
      |pre AS (
      |  SELECT t, day,
      |         CAST((SELECT n FROM tot) AS HUGEINT)
      |           * sum(x) OVER (ORDER BY t)
      |           - CAST(t AS HUGEINT) * (SELECT sx FROM tot) AS a
      |  FROM v),
      |st AS (
      |  SELECT pre.t, pre.day, tot.n,
      |         CAST(tot.n AS DOUBLE) * CAST(pre.a AS DOUBLE) * pre.a
      |           / (CAST(pre.t AS DOUBLE) * (tot.n - pre.t)
      |              * (CAST(tot.n AS DOUBLE) * tot.sxx
      |                 - CAST(tot.sx AS DOUBLE) * tot.sx)) AS tt
      |  FROM pre CROSS JOIN tot WHERE pre.t < tot.n)
      |SELECT CAST(n AS BIGINT) AS n_days,
      |       CAST(floor(tt * 1000) AS BIGINT) AS t_max_milli,
      |       CAST(day AS BIGINT) AS split_day
      |FROM st ORDER BY tt DESC, day LIMIT 1
      |""".stripMargin)) { (s, dir) =>
    val v = series(s, dir)
      .select(col("t"), col("day"), expr("net div 100").as("x"))
      .materialize()
    val tot = v.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"))
    v.withColumn("ps", sum(col("x")).over(Window.orderBy(col("t"))))
      .crossJoin(broadcast(tot))
      .where(col("t") < col("n"))
      .select(col("n"), col("day"),
        (col("n").cast("decimal(38,0)") * col("ps")
          - col("t").cast("decimal(38,0)") * col("sx")).as("a"),
        col("t"), col("sx"), col("sxx"))
      .select(col("n"), col("day"),
        expr("CAST(n AS DOUBLE) * CAST(a AS DOUBLE) * a" +
          " / (CAST(t AS DOUBLE) * (n - t)" +
          " * (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))")
          .as("tt"))
      .orderBy(col("tt").desc, col("day"))
      .limit(1)
      .select(col("n").cast("long").as("n_days"),
        expr("CAST(floor(tt * 1000) AS BIGINT)").as("t_max_milli"),
        col("day").cast("long").as("split_day"))
  }

  /** Buishand range: partial sums S*_t = S_t − t·x̄ (exact as
    * A_t = n·S_t − t·S_n), R = (max S* − min S*)/s, reported as
    * R/√n (milli) with the argmax-|S*| day. */
  def q713: Q = Q(
    "q713_buishand_range",
    Some(s"""
      |WITH ${sqlSeries},
      |v AS (SELECT t, day, net // 100 AS x FROM o),
      |tot AS (SELECT count(*) AS n, sum(x) AS sx,
      |               sum(CAST(x AS HUGEINT) * x) AS sxx FROM v),
      |pre AS (
      |  SELECT t, day,
      |         CAST((SELECT n FROM tot) AS HUGEINT)
      |           * sum(x) OVER (ORDER BY t)
      |           - CAST(t AS HUGEINT) * (SELECT sx FROM tot) AS a
      |  FROM v),
      |rg AS (SELECT max(a) AS amax, min(a) AS amin FROM pre),
      |pk AS (SELECT day FROM pre ORDER BY abs(a) DESC, day LIMIT 1)
      |SELECT CAST(tot.n AS BIGINT) AS n_days,
      |       CAST(floor((CAST(rg.amax AS DOUBLE) - CAST(rg.amin
      |              AS DOUBLE))
      |            / (CAST(tot.n AS DOUBLE)
      |               * sqrt((CAST(tot.n AS DOUBLE) * tot.sxx
      |                       - CAST(tot.sx AS DOUBLE) * tot.sx)
      |                      / (CAST(tot.n AS DOUBLE) * tot.n))
      |               * sqrt(CAST(tot.n AS DOUBLE))) * 1000.0)
      |            AS BIGINT) AS rb_sqrt_n_milli,
      |       CAST(pk.day AS BIGINT) AS peak_day
      |FROM tot CROSS JOIN rg CROSS JOIN pk
      |""".stripMargin)) { (s, dir) =>
    val v = series(s, dir)
      .select(col("t"), col("day"), expr("net div 100").as("x"))
      .materialize()
    val tot = v.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"))
    val pre = v
      .withColumn("ps", sum(col("x")).over(Window.orderBy(col("t"))))
      .crossJoin(broadcast(tot))
      .select(col("day"),
        (col("n").cast("decimal(38,0)") * col("ps")
          - col("t").cast("decimal(38,0)") * col("sx")).as("a"))
      .materialize()
    val rg = pre.agg(max(col("a")).as("amax"), min(col("a")).as("amin"))
    val pk = pre.orderBy(abs(col("a")).desc, col("day")).limit(1)
      .select(col("day").as("pday"))
    tot.crossJoin(broadcast(rg)).crossJoin(broadcast(pk))
      .select(col("n").cast("long").as("n_days"),
        expr("CAST(floor((CAST(amax AS DOUBLE) - CAST(amin AS DOUBLE))" +
          " / (CAST(n AS DOUBLE)" +
          " * sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)" +
          " / (CAST(n AS DOUBLE) * n))" +
          " * sqrt(CAST(n AS DOUBLE))) * 1000.0) AS BIGINT)")
          .as("rb_sqrt_n_milli"),
        col("pday").cast("long").as("peak_day"))
  }

  /** Von Neumann ratio VN = Σ(x_t−x_{t−1})²/Σ(x_t−x̄)² — ≈2 for a
    * random series, <2 under positive drift/serial correlation. Both
    * sums exact integers (dollar-rescaled); one truncating division:
    * VN_milli = 1000·n·Σd² // (n·Σx² − S²). */
  def q714: Q = Q(
    "q714_von_neumann_ratio",
    Some(s"""
      |WITH ${sqlSeries},
      |v AS (SELECT t, net // 100 AS x FROM o),
      |df AS (
      |  SELECT x - lag(x) OVER (ORDER BY t) AS dx FROM v),
      |nm AS (SELECT sum(CAST(dx AS HUGEINT) * dx) AS sd2 FROM df
      |       WHERE dx IS NOT NULL),
      |tot AS (SELECT count(*) AS n, sum(x) AS sx,
      |               sum(CAST(x AS HUGEINT) * x) AS sxx FROM v)
      |SELECT CAST(n AS BIGINT) AS n_days,
      |       CAST((1000 * CAST(n AS HUGEINT) * sd2)
      |            // (CAST(n AS HUGEINT) * sxx
      |                - CAST(sx AS HUGEINT) * sx) AS BIGINT)
      |         AS vn_milli
      |FROM nm CROSS JOIN tot
      |""".stripMargin)) { (s, dir) =>
    val v = series(s, dir)
      .select(col("t"), expr("net div 100").as("x"))
      .materialize()
    val nm = v
      .withColumn("dx", col("x") - lag(col("x"), 1)
        .over(Window.orderBy(col("t"))))
      .where(col("dx").isNotNull)
      .agg(sum(col("dx").cast("decimal(38,0)") * col("dx")).as("sd2"))
    val tot = v.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"))
    nm.crossJoin(broadcast(tot))
      .select(col("n").cast("long").as("n_days"),
        expr("CAST((1000 * CAST(n AS DECIMAL(38,0)) * sd2)" +
          " div (CAST(n AS DECIMAL(38,0)) * sxx" +
          " - CAST(sx AS DECIMAL(38,0)) * sx) AS BIGINT)")
          .as("vn_milli"))
  }

  /** Bartels' rank von Neumann ratio: the same statistic on doubled
    * midranks (distribution-free randomness test) — fully integer:
    * RVN_milli = 1000·n·Σ(D_t−D_{t−1})² // (n·ΣD² − (ΣD)²). */
  def q715: Q = Q(
    "q715_bartels_rank_vn",
    Some(s"""
      |WITH ${sqlSeries},
      |rk AS (
      |  SELECT t,
      |         2 * rank() OVER (ORDER BY net)
      |           + count(*) OVER (PARTITION BY net) - 1 AS dd
      |  FROM o),
      |df AS (
      |  SELECT dd - lag(dd) OVER (ORDER BY t) AS dx FROM rk),
      |nm AS (SELECT sum(CAST(dx AS HUGEINT) * dx) AS sd2 FROM df
      |       WHERE dx IS NOT NULL),
      |tot AS (SELECT count(*) AS n, sum(dd) AS sx,
      |               sum(CAST(dd AS HUGEINT) * dd) AS sxx FROM rk)
      |SELECT CAST(n AS BIGINT) AS n_days,
      |       CAST((1000 * CAST(n AS HUGEINT) * sd2)
      |            // (CAST(n AS HUGEINT) * sxx
      |                - CAST(sx AS HUGEINT) * sx) AS BIGINT)
      |         AS rvn_milli
      |FROM nm CROSS JOIN tot
      |""".stripMargin)) { (s, dir) =>
    val rk = series(s, dir)
      .withColumn("dd",
        lit(2) * rank().over(Window.orderBy(col("net")))
          + count(lit(1)).over(Window.partitionBy(col("net"))) - 1)
      .select(col("t"), col("dd"))
      .materialize()
    val nm = rk
      .withColumn("dx", col("dd") - lag(col("dd"), 1)
        .over(Window.orderBy(col("t"))))
      .where(col("dx").isNotNull)
      .agg(sum(col("dx").cast("decimal(38,0)") * col("dx")).as("sd2"))
    val tot = rk.agg(count(lit(1)).as("n"), sum(col("dd")).as("sx"),
      sum(col("dd").cast("decimal(38,0)") * col("dd")).as("sxx"))
    nm.crossJoin(broadcast(tot))
      .select(col("n").cast("long").as("n_days"),
        expr("CAST((1000 * CAST(n AS DECIMAL(38,0)) * sd2)" +
          " div (CAST(n AS DECIMAL(38,0)) * sxx" +
          " - CAST(sx AS DECIMAL(38,0)) * sx) AS BIGINT)")
          .as("rvn_milli"))
  }
}
