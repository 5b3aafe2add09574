package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables
import graft.dedup.SortedNeighborhood

/** Round-9 bibliometrics wave: the order book as a citation corpus —
  * authors = customers (papers = orders), journals = suppliers
  * (articles = lineitems). The classical concentration laws: Lotka's
  * inverse-power productivity exponent, Price's square-root elite
  * share, Bradford's three-zone core-scatter split, Trueswell's 80/20
  * rule, and Pratt's rank-weighted concentration index.
  *
  * Scale: author and journal count tables are fact-derived dims, so
  * every rank/cumulative rides the bucket-parallel
  * [[SortedNeighborhood.globalRankCum]] spine (bucket = −count, a
  * monotone coarse prefix of the count-descending order; ties broken
  * by key) — no single-partition window ever sees a fact-scaled row
  * set. Lotka's log-log OLS runs on the ≤|max-count| productivity
  * histogram with the established DECIMAL(18,9) ln-term quantization
  * (q615 discipline), all other statistics are exact integer ratios. */
object BibliometricQueries {

  val all: Seq[Q] = Seq(q801, q802, q803, q804, q805)

  /** Spark author-rank spine: (a, cnt, __rank, __cum) ranked by
    * (cnt desc, a asc) with inclusive cumulative papers. */
  private def authorRank(s: SparkSession, dir: String): DataFrame = {
    val ac = Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("a"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("nb", -col("cnt"))
    SortedNeighborhood.globalRankCum(ac, "a", "nb", Seq.empty,
      cumCol = Some("cnt"))
  }

  /** Spark journal-rank spine over supplier article counts. */
  private def journalRank(s: SparkSession, dir: String): DataFrame = {
    val jc = Tables.lineitem(s, dir)
      .groupBy(col("l_suppkey").as("j"))
      .agg(count(lit(1)).as("a"))
      .withColumn("nb", -col("a"))
    SortedNeighborhood.globalRankCum(jc, "j", "nb", Seq.empty,
      cumCol = Some("a"))
  }

  private def sqlAuthorRank: String = """
    |ac AS (SELECT o_custkey AS a, count(*) AS cnt FROM orders GROUP BY 1),
    |rk AS (SELECT a, cnt,
    |              row_number() OVER (ORDER BY cnt DESC, a) AS r,
    |              sum(cnt) OVER (ORDER BY cnt DESC, a) AS cum FROM ac),
    |gl AS (SELECT count(*) AS n, sum(cnt) AS t FROM ac)""".stripMargin

  /** Lotka's law: log-log OLS slope of the author-productivity
    * histogram (#authors with k papers vs k). */
  def q801: Q = Q(
    "q801_lotka_exponent",
    Some("""
      |WITH ac AS (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1),
      |dist AS (SELECT cnt AS k, count(*) AS nk FROM ac GROUP BY 1),
      |lt AS (SELECT CAST(ln(k) AS DECIMAL(18,9)) AS x,
      |              CAST(ln(nk) AS DECIMAL(18,9)) AS y FROM dist),
      |mo AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |              sum(x * y) AS sxy, sum(x * x) AS sxx FROM lt)
      |SELECT CAST(n AS BIGINT) AS n_points,
      |       CAST(floor(1000.0 * CAST(n * sxy - sx * sy AS DOUBLE)
      |            / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)
      |         AS lotka_slope_milli
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("cnt").as("k")).agg(count(lit(1)).as("nk"))
      .select(expr("CAST(ln(k) AS DECIMAL(18,9))").as("x"),
        expr("CAST(ln(nk) AS DECIMAL(18,9))").as("y"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("n").cast("long").as("n_points"),
        expr("""CAST(floor(1000.0 * CAST(n * sxy - sx * sy AS DOUBLE)
          |  / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)"""
          .stripMargin).as("lotka_slope_milli"))
  }

  /** Price's square-root law: the ⌈√N⌉ most prolific authors' share
    * of all papers (deterministic count-desc, key-asc ranking). */
  def q802: Q = Q(
    "q802_price_sqrt_law",
    Some(s"""
      |WITH ${sqlAuthorRank},
      |s AS (SELECT CAST(ceil(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS s
      |      FROM gl)
      |SELECT CAST(gl.n AS BIGINT) AS n_authors,
      |       CAST(s.s AS BIGINT) AS sqrt_core,
      |       CAST((SELECT cum FROM rk WHERE r = s.s) AS BIGINT)
      |         AS core_papers,
      |       CAST(gl.t AS BIGINT) AS total_papers,
      |       CAST((1000 * (SELECT cum FROM rk WHERE r = s.s)) // gl.t
      |            AS BIGINT) AS price_share_milli
      |FROM gl CROSS JOIN s
      |""".stripMargin)) { (s, dir) =>
    val rk = authorRank(s, dir)
    val gl = rk.agg(count(lit(1)).as("n"), sum(col("cnt")).as("t"))
      .withColumn("s", expr("CAST(ceil(sqrt(CAST(n AS DOUBLE))) AS BIGINT)"))
    rk.join(broadcast(gl), col("__rank") === col("s"))
      .select(col("n").cast("long").as("n_authors"),
        col("s").cast("long").as("sqrt_core"),
        col("__cum").cast("long").as("core_papers"),
        col("t").cast("long").as("total_papers"),
        expr("CAST((1000 * __cum) div t AS BIGINT)")
          .as("price_share_milli"))
  }

  /** Bradford core-scatter zones: journals in article-count-descending
    * order split where cumulative articles cross T/3 and 2T/3. */
  def q803: Q = Q(
    "q803_bradford_zones",
    Some("""
      |WITH jc AS (SELECT l_suppkey AS j, count(*) AS a
      |            FROM lineitem GROUP BY 1),
      |gl AS (SELECT sum(a) AS t FROM jc),
      |rk AS (SELECT j, a, sum(a) OVER (ORDER BY a DESC, j) AS cum
      |       FROM jc),
      |zn AS (SELECT least(2, (3 * (cum - 1)) // gl.t) AS z, a
      |       FROM rk CROSS JOIN gl)
      |SELECT CAST(z + 1 AS BIGINT) AS zone,
      |       CAST(count(*) AS BIGINT) AS n_journals,
      |       CAST(sum(a) AS BIGINT) AS n_articles
      |FROM zn GROUP BY z ORDER BY z
      |""".stripMargin)) { (s, dir) =>
    val rk = journalRank(s, dir)
    val gl = rk.agg(sum(col("a")).as("t"))
    rk.crossJoin(broadcast(gl))
      .select(expr("least(2, (3 * (__cum - 1)) div t)").as("z"), col("a"))
      .groupBy(col("z"))
      .agg(count(lit(1)).as("nj"), sum(col("a")).as("na"))
      .select((col("z") + 1).cast("long").as("zone"),
        col("nj").cast("long").as("n_journals"),
        col("na").cast("long").as("n_articles"))
      .orderBy(col("zone"))
  }

  /** Trueswell 80/20: the smallest author head (by paper count)
    * holding ≥80% of all papers, as a count and an author share. */
  def q804: Q = Q(
    "q804_trueswell_8020",
    Some(s"""
      |WITH ${sqlAuthorRank},
      |hd AS (SELECT min(r) AS n80 FROM rk CROSS JOIN gl
      |       WHERE 5 * cum >= 4 * gl.t)
      |SELECT CAST(gl.n AS BIGINT) AS n_authors,
      |       CAST(hd.n80 AS BIGINT) AS n_core_80,
      |       CAST((1000 * hd.n80) // gl.n AS BIGINT)
      |         AS author_share_milli
      |FROM gl CROSS JOIN hd
      |""".stripMargin)) { (s, dir) =>
    val rk = authorRank(s, dir).materialize()
    val gl = rk.agg(count(lit(1)).as("n"), sum(col("cnt")).as("t"))
    val hd = rk.crossJoin(broadcast(gl))
      .where(col("__cum") * 5 >= col("t") * 4)
      .agg(min(col("__rank")).as("n80"))
    gl.crossJoin(broadcast(hd))
      .select(col("n").cast("long").as("n_authors"),
        col("n80").cast("long").as("n_core_80"),
        expr("CAST((1000 * n80) div n AS BIGINT)")
          .as("author_share_milli"))
  }

  /** Pratt's concentration index over journal article counts:
    * C = (n + 1 − 2·Σ r·p_r)/(n − 1), exact integer ratio. */
  def q805: Q = Q(
    "q805_pratt_index",
    Some("""
      |WITH jc AS (SELECT l_suppkey AS j, count(*) AS a
      |            FROM lineitem GROUP BY 1),
      |rk AS (SELECT j, a, row_number() OVER (ORDER BY a DESC, j) AS r
      |       FROM jc),
      |mo AS (SELECT count(*) AS n, sum(a) AS t, sum(r * a) AS ra
      |       FROM rk)
      |SELECT CAST(n AS BIGINT) AS n_journals,
      |       CAST(t AS BIGINT) AS n_articles,
      |       CAST((1000 * ((n + 1) * t - 2 * ra)) // ((n - 1) * t)
      |            AS BIGINT) AS pratt_milli
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    journalRank(s, dir)
      .agg(count(lit(1)).as("n"), sum(col("a")).as("t"),
        sum(col("__rank") * col("a")).as("ra"))
      .select(col("n").cast("long").as("n_journals"),
        col("t").cast("long").as("n_articles"),
        expr("CAST((1000 * ((n + 1) * t - 2 * ra)) div ((n - 1) * t)" +
          " AS BIGINT)").as("pratt_milli"))
  }
}
