package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-9 price-index completion wave: Walsh, Marshall–Edgeworth,
  * Sato–Vartia, the elementary-aggregate trio (Carli/Dutot/Jevons) and
  * a Lowe index with a lagged weight basket — the remaining classical
  * index-number formulas next to the suite's Laspeyres (q384),
  * Paasche/Fisher (q391), Törnqvist (q522) and chained (q422) faces.
  * All ride the q384 spine: per-(part, year) milli unit prices and
  * quantities as exact integers; irrational per-item factors (√, ln,
  * log-means) are quantized to integers ITEM-BY-ITEM before any
  * cross-item sum, so aggregate order never touches the result. */
object PriceIndexQueries {

  val all: Seq[Q] = Seq(q716, q717, q718, q719, q720)

  /** Oracle CTE `up(part, y, upm, qty)` — milli unit price and total
    * quantity per part-year (q384's definition verbatim). */
  private def sqlUp: String = """
    |py AS (
    |  SELECT l_partkey AS part, CAST(year(l_shipdate) AS BIGINT) AS y,
    |         sum(CAST(floor(CAST(l_extendedprice * (1.0 - l_discount)
    |              AS DECIMAL(18,9)) * 100) AS BIGINT)) AS net,
    |         sum(CAST(l_quantity AS BIGINT)) AS qty
    |  FROM lineitem GROUP BY 1, 2),
    |up AS (SELECT part, y, (1000 * net) // qty AS upm, qty FROM py)""".stripMargin

  private def up(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_partkey").as("part"),
        year(col("l_shipdate")).cast("long").as("y"))
      .agg(sum(floor((col("l_extendedprice")
          * (lit(1.0) - col("l_discount"))).cast("decimal(18,9)") * 100)
          .cast("long")).as("net"),
        sum(col("l_quantity").cast("long")).as("qty"))
      .select(col("part"), col("y"),
        expr("(1000 * net) div qty").as("upm"), col("qty"))

  /** Joined basket `bk(y, upm, qty, up0, q0)` — parts traded in both
    * 1995 and year t (the q384 stated-basket rule). */
  private def basket(s: SparkSession, dir: String): DataFrame = {
    val u = up(s, dir).materialize() // part×year dim, feeds both sides
    val base = u.where(col("y") === 1995)
      .select(col("part"), col("upm").as("up0"), col("qty").as("q0"))
    u.where(col("y") =!= 1995).join(broadcast(base), Seq("part"))
  }

  private def sqlBasket: String = sqlUp + """,
    |base AS (SELECT part, upm AS up0, qty AS q0 FROM up WHERE y = 1995),
    |bk AS (
    |  SELECT up.y, up.upm, up.qty, base.up0, base.q0
    |  FROM up JOIN base USING (part) WHERE up.y <> 1995)""".stripMargin

  /** Walsh index: Σp_t√(q₀q_t) / Σp₀√(q₀q_t) per year — the
    * geometric-mean basket. √(q₀q_t) is quantized to milli PER PART
    * (identical double sqrt both engines), then both sums are exact
    * integers. */
  def q716: Q = Q(
    "q716_walsh_index",
    Some(s"""
      |WITH ${sqlBasket},
      |w AS (
      |  SELECT y, upm, up0,
      |         CAST(floor(sqrt(CAST(CAST(q0 AS HUGEINT) * qty
      |              AS DOUBLE)) * 1000) AS BIGINT) AS wq
      |  FROM bk)
      |SELECT y, CAST(count(*) AS BIGINT) AS n_parts,
      |       CAST((1000000 * sum(CAST(upm AS HUGEINT) * wq))
      |            // sum(CAST(up0 AS HUGEINT) * wq) AS BIGINT)
      |         AS walsh_ppm
      |FROM w GROUP BY y ORDER BY y
      |""".stripMargin)) { (s, dir) =>
    basket(s, dir)
      .withColumn("wq",
        floor(sqrt((col("q0").cast("decimal(38,0)") * col("qty"))
          .cast("double")) * 1000).cast("long"))
      .groupBy(col("y"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("upm").cast("decimal(38,0)") * col("wq")).as("num"),
        sum(col("up0").cast("decimal(38,0)") * col("wq")).as("den"))
      .select(col("y"), col("n_parts"),
        expr("CAST((1000000 * num) div den AS BIGINT)").as("walsh_ppm"))
      .orderBy(col("y"))
  }

  /** Marshall–Edgeworth index: Σp_t(q₀+q_t) / Σp₀(q₀+q_t) per year —
    * the arithmetic-mean basket, fully integer. */
  def q717: Q = Q(
    "q717_marshall_edgeworth",
    Some(s"""
      |WITH ${sqlBasket}
      |SELECT y, CAST(count(*) AS BIGINT) AS n_parts,
      |       CAST((1000000 * sum(CAST(upm AS HUGEINT) * (q0 + qty)))
      |            // sum(CAST(up0 AS HUGEINT) * (q0 + qty)) AS BIGINT)
      |         AS me_ppm
      |FROM bk GROUP BY y ORDER BY y
      |""".stripMargin)) { (s, dir) =>
    basket(s, dir)
      .groupBy(col("y"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("upm").cast("decimal(38,0)") * (col("q0") + col("qty")))
          .as("num"),
        sum(col("up0").cast("decimal(38,0)") * (col("q0") + col("qty")))
          .as("den"))
      .select(col("y"), col("n_parts"),
        expr("CAST((1000000 * num) div den AS BIGINT)").as("me_ppm"))
      .orderBy(col("y"))
  }

  /** Sato–Vartia (log-ideal) index per year: weights are logarithmic
    * means of the base/current expenditure shares. Shares come from
    * exact integer expenditures; each part's log-mean weight (×10¹²)
    * and log price relative (×10⁹) are quantized per item, the
    * weighted sum is exact integer, and one final exp is pinned. */
  def q718: Q = Q(
    "q718_sato_vartia",
    Some(s"""
      |WITH ${sqlBasket},
      |ex AS (
      |  SELECT y, upm, up0,
      |         CAST(up0 AS HUGEINT) * q0 AS v0,
      |         CAST(upm AS HUGEINT) * qty AS vt,
      |         sum(CAST(up0 AS HUGEINT) * q0) OVER (PARTITION BY y)
      |           AS tv0,
      |         sum(CAST(upm AS HUGEINT) * qty) OVER (PARTITION BY y)
      |           AS tvt
      |  FROM bk),
      |lm AS (
      |  SELECT y, upm, up0,
      |         CAST(v0 AS DOUBLE) / CAST(tv0 AS DOUBLE) AS s0,
      |         CAST(vt AS DOUBLE) / CAST(tvt AS DOUBLE) AS st
      |  FROM ex),
      |qz AS (
      |  SELECT y,
      |         CAST(floor(CASE WHEN st = s0 THEN st * 1000000000000.0
      |              ELSE (st - s0) / (ln(st) - ln(s0))
      |                   * 1000000000000.0 END) AS BIGINT) AS li,
      |         CAST(floor(ln(CAST(upm AS DOUBLE) / up0)
      |              * 1000000000.0) AS BIGINT) AS lr
      |  FROM lm)
      |SELECT y, CAST(count(*) AS BIGINT) AS n_parts,
      |       CAST(floor(exp(CAST(sum(CAST(li AS HUGEINT) * lr)
      |              AS DOUBLE)
      |            / (CAST(sum(li) AS DOUBLE) * 1000000000.0))
      |            * 1000000.0) AS BIGINT) AS sv_ppm
      |FROM qz GROUP BY y ORDER BY y
      |""".stripMargin)) { (s, dir) =>
    val yw = org.apache.spark.sql.expressions.Window.partitionBy("y")
    basket(s, dir)
      .withColumn("v0", col("up0").cast("decimal(38,0)") * col("q0"))
      .withColumn("vt", col("upm").cast("decimal(38,0)") * col("qty"))
      .withColumn("tv0", sum(col("v0")).over(yw))
      .withColumn("tvt", sum(col("vt")).over(yw))
      .select(col("y"),
        expr("CAST(v0 AS DOUBLE) / CAST(tv0 AS DOUBLE)").as("s0"),
        expr("CAST(vt AS DOUBLE) / CAST(tvt AS DOUBLE)").as("st"),
        col("upm"), col("up0"))
      .select(col("y"),
        expr("CAST(floor(CASE WHEN st = s0 THEN st * 1000000000000.0" +
          " ELSE (st - s0) / (ln(st) - ln(s0)) * 1000000000000.0 END)" +
          " AS BIGINT)").as("li"),
        expr("CAST(floor(ln(CAST(upm AS DOUBLE) / up0)" +
          " * 1000000000.0) AS BIGINT)").as("lr"))
      .groupBy(col("y"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("li").cast("decimal(38,0)") * col("lr")).as("num"),
        sum(col("li")).as("den"))
      .select(col("y"), col("n_parts"),
        expr("CAST(floor(exp(CAST(num AS DOUBLE)" +
          " / (CAST(den AS DOUBLE) * 1000000000.0))" +
          " * 1000000.0) AS BIGINT)").as("sv_ppm"))
      .orderBy(col("y"))
  }

  /** Elementary-aggregate trio per year (unweighted, as price
    * collectors compute them): Carli (mean of relatives), Dutot
    * (ratio of means), Jevons (geometric mean of relatives). Each
    * per-part relative / log-relative is ppm/nano-quantized before
    * the exact integer mean; Carli ≥ Jevons always — the trio spread
    * IS the formula-bias audit. */
  def q719: Q = Q(
    "q719_elementary_indices",
    Some(s"""
      |WITH ${sqlBasket},
      |rl AS (
      |  SELECT y,
      |         (1000000 * CAST(upm AS HUGEINT)) // up0 AS rel_ppm,
      |         CAST(floor(ln(CAST(upm AS DOUBLE) / up0)
      |              * 1000000000.0) AS BIGINT) AS lr,
      |         upm, up0
      |  FROM bk)
      |SELECT y, CAST(count(*) AS BIGINT) AS n_parts,
      |       CAST(sum(rel_ppm) // count(*) AS BIGINT) AS carli_ppm,
      |       CAST((1000000 * sum(CAST(upm AS HUGEINT))) // sum(up0)
      |            AS BIGINT) AS dutot_ppm,
      |       CAST(floor(exp(CAST(sum(lr) AS DOUBLE)
      |            / (CAST(count(*) AS DOUBLE) * 1000000000.0))
      |            * 1000000.0) AS BIGINT) AS jevons_ppm
      |FROM rl GROUP BY y ORDER BY y
      |""".stripMargin)) { (s, dir) =>
    basket(s, dir)
      .select(col("y"),
        expr("(1000000 * CAST(upm AS DECIMAL(38,0))) div up0")
          .as("rel_ppm"),
        expr("CAST(floor(ln(CAST(upm AS DOUBLE) / up0)" +
          " * 1000000000.0) AS BIGINT)").as("lr"),
        col("upm"), col("up0"))
      .groupBy(col("y"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("rel_ppm")).as("sr"),
        sum(col("upm").cast("decimal(38,0)")).as("st"),
        sum(col("up0").cast("decimal(38,0)")).as("s0"),
        sum(col("lr")).as("sl"))
      .select(col("y"), col("n_parts"),
        expr("CAST(sr div n_parts AS BIGINT)").as("carli_ppm"),
        expr("CAST((1000000 * st) div s0 AS BIGINT)").as("dutot_ppm"),
        expr("CAST(floor(exp(CAST(sl AS DOUBLE)" +
          " / (CAST(n_parts AS DOUBLE) * 1000000000.0))" +
          " * 1000000.0) AS BIGINT)").as("jevons_ppm"))
      .orderBy(col("y"))
  }

  /** Lowe index: weight basket from 1995, PRICE reference 1996 —
    * the production CPI shape (weights lag the link period). Index
    * for 1997+ = Σp_t·q_b / Σp_ref·q_b over parts traded in all
    * three periods; fully integer. */
  def q720: Q = Q(
    "q720_lowe_index",
    Some(s"""
      |WITH ${sqlUp},
      |wb AS (SELECT part, qty AS qb FROM up WHERE y = 1995),
      |pr AS (SELECT part, upm AS upr FROM up WHERE y = 1996),
      |bk AS (
      |  SELECT up.y, up.upm, wb.qb, pr.upr
      |  FROM up JOIN wb USING (part) JOIN pr USING (part)
      |  WHERE up.y >= 1997)
      |SELECT y, CAST(count(*) AS BIGINT) AS n_parts,
      |       CAST((1000000 * sum(CAST(upm AS HUGEINT) * qb))
      |            // sum(CAST(upr AS HUGEINT) * qb) AS BIGINT)
      |         AS lowe_ppm
      |FROM bk GROUP BY y ORDER BY y
      |""".stripMargin)) { (s, dir) =>
    val u = up(s, dir).materialize()
    val wb = u.where(col("y") === 1995)
      .select(col("part"), col("qty").as("qb"))
    val pr = u.where(col("y") === 1996)
      .select(col("part"), col("upm").as("upr"))
    u.where(col("y") >= 1997)
      .join(broadcast(wb), Seq("part"))
      .join(broadcast(pr), Seq("part"))
      .groupBy(col("y"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("upm").cast("decimal(38,0)") * col("qb")).as("num"),
        sum(col("upr").cast("decimal(38,0)") * col("qb")).as("den"))
      .select(col("y"), col("n_parts"),
        expr("CAST((1000000 * num) div den AS BIGINT)").as("lowe_ppm"))
      .orderBy(col("y"))
  }
}
