package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Materialize.MatOps
import graft.Tables

/** Round-9 restricted-survival wave on order→ship spans (lineitems
  * shipped at/after their order date — complete observations, so the
  * Kaplan-Meier curve IS the empirical survival and every statistic
  * is an exact integer): RMST at 30/60/90 days, survival quantiles,
  * the fixed-horizon survival curve, mean residual life at t=30, and
  * the per-priority RMST(60) league table.
  *
  * Scale: one fact pass to span days; quantiles come from the
  * value-histogram ECDF (spans are small integers, the histogram is a
  * ≤2.5k-row dim); per-priority stats are 5-group aggregates. */
object RmstQueries {

  val all: Seq[Q] = Seq(q911, q912, q913, q914, q915)

  private def sqlSp: String = """
    |sp AS (
    |  SELECT datediff('day', o.o_orderdate, l.l_shipdate) AS t,
    |         o.o_orderpriority AS pri
    |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    |  WHERE l.l_shipdate >= o.o_orderdate),
    |gl AS (SELECT count(*) AS n FROM sp)""".stripMargin

  private def spBase(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority").as("pri")),
        col("o_orderkey") === col("l_orderkey"))
      .where(col("l_shipdate") >= col("o_orderdate"))
      .select(datediff(col("l_shipdate"), col("o_orderdate")).as("t"),
        col("pri"))

  /** RMST(τ) = mean min(T, τ) at τ = 30/60/90 days (milli). */
  def q911: Q = Q(
    "q911_rmst_ladder",
    Some(s"""
      |WITH ${sqlSp},
      |mo AS (SELECT count(*) AS n,
      |              sum(CAST(least(t, 30) AS HUGEINT)) AS s30,
      |              sum(CAST(least(t, 60) AS HUGEINT)) AS s60,
      |              sum(CAST(least(t, 90) AS HUGEINT)) AS s90
      |       FROM sp)
      |SELECT CAST(n AS BIGINT) AS n_spans,
      |       CAST((1000 * s30) // n AS BIGINT) AS rmst30_milli,
      |       CAST((1000 * s60) // n AS BIGINT) AS rmst60_milli,
      |       CAST((1000 * s90) // n AS BIGINT) AS rmst90_milli
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    spBase(s, dir)
      .select(least(col("t"), lit(30)).cast("decimal(38,0)").as("t30"),
        least(col("t"), lit(60)).cast("decimal(38,0)").as("t60"),
        least(col("t"), lit(90)).cast("decimal(38,0)").as("t90"))
      .agg(count(lit(1)).as("n"), sum(col("t30")).as("s30"),
        sum(col("t60")).as("s60"), sum(col("t90")).as("s90"))
      .select(col("n").cast("long").as("n_spans"),
        expr("CAST((1000 * s30 - (1000 * s30) % n) / n" +
          " AS DECIMAL(38,0))").cast("long").as("rmst30_milli"),
        expr("CAST((1000 * s60 - (1000 * s60) % n) / n" +
          " AS DECIMAL(38,0))").cast("long").as("rmst60_milli"),
        expr("CAST((1000 * s90 - (1000 * s90) % n) / n" +
          " AS DECIMAL(38,0))").cast("long").as("rmst90_milli"))
  }

  /** Survival quantiles: exact ECDF 50/75/90% span days. */
  def q912: Q = Q(
    "q912_survival_quantiles",
    Some(s"""
      |WITH ${sqlSp},
      |vc AS (SELECT t AS val, sum(c) OVER (ORDER BY t) AS cum FROM
      |  (SELECT t, count(*) AS c FROM sp GROUP BY 1))
      |SELECT
      |  CAST((SELECT min(val) FROM vc CROSS JOIN gl
      |        WHERE 2 * cum >= gl.n) AS BIGINT) AS median_days,
      |  CAST((SELECT min(val) FROM vc CROSS JOIN gl
      |        WHERE 4 * cum >= 3 * gl.n) AS BIGINT) AS p75_days,
      |  CAST((SELECT min(val) FROM vc CROSS JOIN gl
      |        WHERE 10 * cum >= 9 * gl.n) AS BIGINT) AS p90_days
      |""".stripMargin)) { (s, dir) =>
    val sp = spBase(s, dir)
    val gl = sp.agg(count(lit(1)).as("n"))
    val vc = sp.groupBy(col("t").as("val")).agg(count(lit(1)).as("c"))
      .select(col("val"),
        sum(col("c")).over(Window.orderBy(col("val"))).as("cum"))
      .crossJoin(broadcast(gl)).materialize()
    def at(num: Int, den: Int, nm: String): DataFrame =
      vc.where(col("cum") * den >= col("n") * num)
        .agg(min(col("val")).as(nm))
    at(1, 2, "median_days").crossJoin(broadcast(at(3, 4, "p75_days")))
      .crossJoin(broadcast(at(9, 10, "p90_days")))
      .select(col("median_days").cast("long").as("median_days"),
        col("p75_days").cast("long").as("p75_days"),
        col("p90_days").cast("long").as("p90_days"))
  }

  /** The empirical survival curve at fixed horizons. */
  def q913: Q = Q(
    "q913_survival_horizons",
    Some(s"""
      |WITH ${sqlSp},
      |hh AS (SELECT * FROM (VALUES (7),(14),(30),(60),(90)) v(h)),
      |sv AS (SELECT hh.h, count(*) AS alive
      |       FROM hh JOIN sp ON sp.t > hh.h GROUP BY 1)
      |SELECT CAST(sv.h AS BIGINT) AS horizon_days,
      |       CAST(sv.alive AS BIGINT) AS n_surviving,
      |       CAST((1000 * sv.alive) // gl.n AS BIGINT)
      |         AS survival_milli
      |FROM sv CROSS JOIN gl ORDER BY horizon_days
      |""".stripMargin)) { (s, dir) =>
    val sp = spBase(s, dir).materialize()
    val gl = sp.agg(count(lit(1)).as("n"))
    val hh = s.createDataFrame(Seq(7, 14, 30, 60, 90).map(Tuple1(_)))
      .toDF("h")
    sp.join(broadcast(hh), col("t") > col("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("alive"))
      .crossJoin(broadcast(gl))
      .select(col("h").cast("long").as("horizon_days"),
        col("alive").cast("long").as("n_surviving"),
        expr("CAST((1000 * alive) div n AS BIGINT)")
          .as("survival_milli"))
      .orderBy(col("horizon_days"))
  }

  /** Mean residual life at t = 30: E[T − 30 | T > 30]. */
  def q914: Q = Q(
    "q914_mean_residual_life",
    Some(s"""
      |WITH ${sqlSp},
      |rl AS (SELECT count(*) AS m,
      |              sum(CAST(t - 30 AS HUGEINT)) AS sr
      |       FROM sp WHERE t > 30)
      |SELECT CAST(m AS BIGINT) AS n_beyond_30,
      |       CAST((1000 * sr) // m AS BIGINT) AS mrl30_milli
      |FROM rl
      |""".stripMargin)) { (s, dir) =>
    spBase(s, dir).where(col("t") > 30)
      .select((col("t") - 30).cast("decimal(38,0)").as("r"))
      .agg(count(lit(1)).as("m"), sum(col("r")).as("sr"))
      .select(col("m").cast("long").as("n_beyond_30"),
        expr("CAST((1000 * sr - (1000 * sr) % m) / m AS DECIMAL(38,0))")
          .cast("long").as("mrl30_milli"))
  }

  /** Per-priority RMST(60) league table. */
  def q915: Q = Q(
    "q915_rmst_by_priority",
    Some(s"""
      |WITH ${sqlSp}
      |SELECT pri AS priority, CAST(count(*) AS BIGINT) AS n_spans,
      |       CAST((1000 * sum(CAST(least(t, 60) AS HUGEINT)))
      |            // count(*) AS BIGINT) AS rmst60_milli
      |FROM sp GROUP BY 1 ORDER BY priority
      |""".stripMargin)) { (s, dir) =>
    spBase(s, dir)
      .groupBy(col("pri").as("priority"))
      .agg(count(lit(1)).as("n"),
        sum(least(col("t"), lit(60)).cast("decimal(38,0)")).as("s60"))
      .select(col("priority"), col("n").cast("long").as("n_spans"),
        expr("CAST((1000 * s60 - (1000 * s60) % n) / n" +
          " AS DECIMAL(38,0))").cast("long").as("rmst60_milli"))
      .orderBy(col("priority"))
  }
}
