package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-9 psychometric item-analysis wave: the order book read as a
  * 5-item test — respondent = customer, item = order priority class,
  * score x_ij = 1 iff customer i ever placed a priority-j order. The
  * classical item-analysis battery follows: item difficulty +
  * Bernoulli variance, KR-20 internal-consistency reliability,
  * point-biserial item-total AND corrected item-rest discrimination,
  * threshold-defined upper/lower discrimination index, and the
  * standardized (Spearman-Brown on mean inter-item r) alpha.
  *
  * Scale: the long item matrix `li` is DISTINCT(customer, priority) —
  * at most 5 rows per customer, built by one distinct over the
  * pushed-down 2-column order scan; every downstream frame is the
  * 5-row item dim, the 10-row item-pair dim, or a 1-row global. The
  * q795 pair counts self-join `li` on customer (≤5×5 fan-out per key,
  * skew-free). All moments are exact integers; each correlation is
  * one pinned double from integer terms, milli/micro-floored BEFORE
  * any cross-pair summation (so the pair mean is an integer mean). */
object PsychometricQueries {

  val all: Seq[Q] = Seq(q791, q792, q793, q794, q795)

  private def sqlBase: String = """
    |li AS (SELECT DISTINCT o_custkey AS cust, o_orderpriority AS item
    |       FROM orders),
    |tot AS (SELECT cust, count(*) AS t FROM li GROUP BY 1),
    |gl AS (SELECT count(*) AS n, sum(t) AS st, sum(t * t) AS st2
    |       FROM tot),
    |itm AS (
    |  SELECT l.item, count(*) AS nj, sum(t.t) AS s1
    |  FROM li l JOIN tot t ON t.cust = l.cust GROUP BY 1)""".stripMargin

  private def liBase(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_custkey").as("cust"), col("o_orderpriority").as("item"))
      .distinct()

  private def totBase(li: DataFrame): DataFrame =
    li.groupBy(col("cust")).agg(count(lit(1)).as("t"))

  private def glBase(tot: DataFrame): DataFrame =
    tot.agg(count(lit(1)).as("n"), sum(col("t")).as("st"),
      sum(col("t") * col("t")).as("st2"))

  private def itmBase(li: DataFrame, tot: DataFrame): DataFrame =
    li.join(tot, Seq("cust"))
      .groupBy(col("item"))
      .agg(count(lit(1)).as("nj"), sum(col("t")).as("s1"))

  /** Item difficulty p_j (share of respondents passing) and the
    * population Bernoulli item variance p·q, both exact floors. */
  def q791: Q = Q(
    "q791_item_difficulty",
    Some(s"""
      |WITH ${sqlBase}
      |SELECT item, CAST(nj AS BIGINT) AS n_pass,
      |       CAST((1000 * nj) // gl.n AS BIGINT) AS p_milli,
      |       CAST((1000000 * nj * (gl.n - nj)) // (gl.n * gl.n)
      |            AS BIGINT) AS var_micro
      |FROM itm CROSS JOIN gl ORDER BY item
      |""".stripMargin)) { (s, dir) =>
    val li = liBase(s, dir)
    val tot = totBase(li)
    itmBase(li, tot).crossJoin(broadcast(glBase(tot)))
      .select(col("item"), col("nj").cast("long").as("n_pass"),
        expr("CAST((1000 * nj) div n AS BIGINT)").as("p_milli"),
        expr("CAST((1000000 * nj * (n - nj)) div (n * n) AS BIGINT)")
          .as("var_micro"))
      .orderBy(col("item"))
  }

  /** Kuder-Richardson 20: k/(k−1)·(1 − Σp_j q_j / σ²_total) with both
    * the Σpq and total-variance terms as exact integer numerators over
    * the shared n² denominator (which cancels). k = 5. */
  def q792: Q = Q(
    "q792_kr20_reliability",
    Some(s"""
      |WITH ${sqlBase},
      |pq AS (SELECT sum(nj * (gl.n - nj)) AS spq FROM itm CROSS JOIN gl)
      |SELECT CAST(gl.n AS BIGINT) AS n_resp,
      |       CAST(pq.spq AS BIGINT) AS sum_pq_num,
      |       CAST(gl.n * gl.st2 - gl.st * gl.st AS BIGINT) AS var_num,
      |       CAST(floor(1250.0 * (1.0 - CAST(pq.spq AS DOUBLE)
      |            / (gl.n * gl.st2 - gl.st * gl.st))) AS BIGINT)
      |         AS kr20_milli
      |FROM gl CROSS JOIN pq
      |""".stripMargin)) { (s, dir) =>
    val li = liBase(s, dir)
    val tot = totBase(li)
    val gl = glBase(tot).materialize()
    val pq = itmBase(li, tot).crossJoin(broadcast(gl))
      .agg(sum(col("nj") * (col("n") - col("nj"))).as("spq"))
    gl.crossJoin(broadcast(pq))
      .select(col("n").cast("long").as("n_resp"),
        col("spq").cast("long").as("sum_pq_num"),
        expr("CAST(n * st2 - st * st AS BIGINT)").as("var_num"),
        expr("""CAST(floor(1250.0 * (1.0 - CAST(spq AS DOUBLE)
          |  / (n * st2 - st * st))) AS BIGINT)""".stripMargin)
          .as("kr20_milli"))
  }

  /** Per-item discrimination: point-biserial item-total r and the
    * corrected item-rest r (item removed from the total), both from
    * exact integer normal-equation terms. */
  def q793: Q = Q(
    "q793_point_biserial",
    Some(s"""
      |WITH ${sqlBase}
      |SELECT item, CAST(nj AS BIGINT) AS n_pass,
      |       CAST(gl.n * s1 - nj * gl.st AS BIGINT) AS num_it,
      |       CAST(floor(1000.0 * (gl.n * s1 - nj * gl.st)
      |            / (sqrt(CAST(nj * (gl.n - nj) AS DOUBLE))
      |               * sqrt(CAST(gl.n * gl.st2 - gl.st * gl.st
      |                      AS DOUBLE)))) AS BIGINT) AS r_pb_milli,
      |       CAST(floor(1000.0 * (gl.n * (s1 - nj) - nj * (gl.st - nj))
      |            / (sqrt(CAST(nj * (gl.n - nj) AS DOUBLE))
      |               * sqrt(CAST(gl.n * (gl.st2 - 2 * s1 + nj)
      |                      - (gl.st - nj) * (gl.st - nj) AS DOUBLE))))
      |         AS BIGINT) AS r_rest_milli
      |FROM itm CROSS JOIN gl ORDER BY item
      |""".stripMargin)) { (s, dir) =>
    val li = liBase(s, dir)
    val tot = totBase(li)
    itmBase(li, tot).crossJoin(broadcast(glBase(tot)))
      .select(col("item"), col("nj").cast("long").as("n_pass"),
        expr("CAST(n * s1 - nj * st AS BIGINT)").as("num_it"),
        expr("""CAST(floor(1000.0 * (n * s1 - nj * st)
          |  / (sqrt(CAST(nj * (n - nj) AS DOUBLE))
          |     * sqrt(CAST(n * st2 - st * st AS DOUBLE)))) AS BIGINT)"""
          .stripMargin).as("r_pb_milli"),
        expr("""CAST(floor(1000.0 * (n * (s1 - nj) - nj * (st - nj))
          |  / (sqrt(CAST(nj * (n - nj) AS DOUBLE))
          |     * sqrt(CAST(n * (st2 - 2 * s1 + nj)
          |            - (st - nj) * (st - nj) AS DOUBLE)))) AS BIGINT)"""
          .stripMargin).as("r_rest_milli"))
      .orderBy(col("item"))
  }

  /** Upper-lower discrimination index with deterministic
    * threshold-defined groups (upper: full score 5, lower: total ≤ 3 —
    * the tie-free stand-in for the classic 27% split). */
  def q794: Q = Q(
    "q794_discrimination_index",
    Some(s"""
      |WITH ${sqlBase},
      |grp AS (
      |  SELECT l.item,
      |         sum(CASE WHEN t.t = 5 THEN 1 ELSE 0 END) AS pu,
      |         sum(CASE WHEN t.t <= 3 THEN 1 ELSE 0 END) AS pl
      |  FROM li l JOIN tot t ON t.cust = l.cust GROUP BY 1),
      |sz AS (
      |  SELECT sum(CASE WHEN t = 5 THEN 1 ELSE 0 END) AS u,
      |         sum(CASE WHEN t <= 3 THEN 1 ELSE 0 END) AS lo
      |  FROM tot)
      |SELECT item, CAST(sz.u AS BIGINT) AS n_upper,
      |       CAST(sz.lo AS BIGINT) AS n_lower,
      |       CAST(grp.pu AS BIGINT) AS pass_upper,
      |       CAST(grp.pl AS BIGINT) AS pass_lower,
      |       CAST((1000 * grp.pu) // sz.u - (1000 * grp.pl) // sz.lo
      |            AS BIGINT) AS d_milli
      |FROM grp CROSS JOIN sz ORDER BY item
      |""".stripMargin)) { (s, dir) =>
    val li = liBase(s, dir)
    val tot = totBase(li).materialize()
    val grp = li.join(tot, Seq("cust"))
      .groupBy(col("item"))
      .agg(sum(when(col("t") === 5, 1).otherwise(0)).as("pu"),
        sum(when(col("t") <= 3, 1).otherwise(0)).as("pl"))
    val sz = tot.agg(
      sum(when(col("t") === 5, 1).otherwise(0)).as("u"),
      sum(when(col("t") <= 3, 1).otherwise(0)).as("lo"))
    grp.crossJoin(broadcast(sz))
      .select(col("item"), col("u").cast("long").as("n_upper"),
        col("lo").cast("long").as("n_lower"),
        col("pu").cast("long").as("pass_upper"),
        col("pl").cast("long").as("pass_lower"),
        expr("CAST((1000 * pu) div u - (1000 * pl) div lo AS BIGINT)")
          .as("d_milli"))
      .orderBy(col("item"))
  }

  /** Standardized alpha: each of the 10 inter-item phi coefficients is
    * micro-floored (pinned double from exact integer terms), the pair
    * mean is an integer mean, and Spearman-Brown stretches it to the
    * 5-item standardized alpha. */
  def q795: Q = Q(
    "q795_standardized_alpha",
    Some(s"""
      |WITH ${sqlBase},
      |pr AS (
      |  SELECT a.item AS j, b.item AS k, count(*) AS njk
      |  FROM li a JOIN li b ON b.cust = a.cust AND b.item > a.item
      |  GROUP BY 1, 2),
      |rjk AS (
      |  SELECT CAST(floor(1000000.0 * (gl.n * pr.njk - ia.nj * ib.nj)
      |         / (sqrt(CAST(ia.nj * (gl.n - ia.nj) AS DOUBLE))
      |            * sqrt(CAST(ib.nj * (gl.n - ib.nj) AS DOUBLE))))
      |         AS BIGINT) AS r
      |  FROM pr JOIN itm ia ON ia.item = pr.j
      |       JOIN itm ib ON ib.item = pr.k
      |  CROSS JOIN gl),
      |rb AS (SELECT count(*) AS np, sum(r) AS sr FROM rjk)
      |SELECT CAST(np AS BIGINT) AS n_pairs,
      |       CAST(sr // np AS BIGINT) AS rbar_micro,
      |       CAST(floor(1000.0 * (5.0 * (CAST(sr AS DOUBLE) / np / 1e6))
      |            / (1.0 + 4.0 * (CAST(sr AS DOUBLE) / np / 1e6)))
      |            AS BIGINT) AS alpha_std_milli
      |FROM rb
      |""".stripMargin)) { (s, dir) =>
    val li = liBase(s, dir).materialize()
    val tot = totBase(li)
    val gl = glBase(tot)
    val itm = itmBase(li, tot)
    val pr = li.join(
      li.select(col("cust").as("cust2"), col("item").as("k")),
      col("cust") === col("cust2") && col("k") > col("item"))
      .groupBy(col("item").as("j"), col("k"))
      .agg(count(lit(1)).as("njk"))
    val rjk = pr
      .join(broadcast(itm.select(col("item").as("j"), col("nj").as("nja"))),
        Seq("j"))
      .join(broadcast(itm.select(col("item").as("k"), col("nj").as("njb"))),
        Seq("k"))
      .crossJoin(broadcast(gl))
      .select(expr(
        """CAST(floor(1000000.0 * (n * njk - nja * njb)
          |  / (sqrt(CAST(nja * (n - nja) AS DOUBLE))
          |     * sqrt(CAST(njb * (n - njb) AS DOUBLE)))) AS BIGINT)"""
          .stripMargin).as("r"))
    rjk.agg(count(lit(1)).as("np"), sum(col("r")).as("sr"))
      .select(col("np").cast("long").as("n_pairs"),
        expr("CAST(sr div np AS BIGINT)").as("rbar_micro"),
        expr("""CAST(floor(1000.0 * (5.0 * (CAST(sr AS DOUBLE) / np / 1e6))
          |  / (1.0 + 4.0 * (CAST(sr AS DOUBLE) / np / 1e6))) AS BIGINT)"""
          .stripMargin).as("alpha_std_milli"))
  }
}
