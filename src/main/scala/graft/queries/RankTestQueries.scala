package graft.queries

import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-9 rank-test completion wave: Friedman's χ², the
  * Jonckheere–Terpstra ordered-alternative test, Page's L trend test,
  * Brunner–Munzel's relative effect, and the Ansari–Bradley scale
  * test — the classical rank batteries the suite's Quade/KW/MW faces
  * referenced but didn't ship. Every statistic is EXACT INTEGER (or
  * exact rational with one pinned double): within-block ranks live on
  * block×treatment dims, and the two-sample/ordered tests derive U
  * statistics and midranks from the bounded VALUE HISTOGRAM of
  * quantity (1..50) — never a row-rank over the fact table. */
object RankTestQueries {

  val all: Seq[Q] = Seq(q686, q687, q688, q689, q690)

  /** Friedman test: do the 5 regions keep the same revenue ORDER
    * across year-quarter blocks? Within-block ranks (revenue cents,
    * ties impossible at cents grain in practice — ties share average
    * rank via the midrank formulation) over a 28×5 dim, χ²_F =
    * 12/(bk(k+1))·ΣR_j² − 3b(k+1) with the tie-free closed form in
    * exact integers (×12 scaling), one final division. */
  def q686: Q = Q(
    "q686_friedman_regions",
    Some("""
      |WITH rv AS (
      |  SELECT year(l.l_shipdate) * 4
      |           + (month(l.l_shipdate) - 1) // 3 AS blk,
      |         n.n_regionkey AS trt,
      |         sum(CAST(l.l_extendedprice * 100 AS HUGEINT)) AS cents
      |  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |       JOIN nation n ON n.n_nationkey = s.s_nationkey
      |  GROUP BY 1, 2),
      |rk AS (
      |  SELECT blk, trt,
      |         rank() OVER (PARTITION BY blk ORDER BY cents) AS r,
      |         count(*) OVER (PARTITION BY blk) AS k
      |  FROM rv),
      |full_ AS (SELECT * FROM rk WHERE k = 5),
      |rj AS (SELECT trt, sum(r) AS rsum, count(*) AS b
      |       FROM full_ GROUP BY 1),
      |st AS (
      |  SELECT max(b) AS b, count(*) AS k, sum(rsum * rsum) AS s2
      |  FROM rj)
      |SELECT CAST(b AS BIGINT) AS n_blocks,
      |       CAST(k AS BIGINT) AS k_treatments,
      |       CAST(s2 AS BIGINT) AS sum_ranksum_sq,
      |       CAST(floor((12.0 * CAST(s2 AS DOUBLE)
      |            / (CAST(b AS DOUBLE) * CAST(k AS DOUBLE)
      |               * CAST(k + 1 AS DOUBLE))
      |            - 3.0 * CAST(b AS DOUBLE) * CAST(k + 1 AS DOUBLE))
      |            * 1000.0) AS BIGINT) AS chi2_milli
      |FROM st
      |""".stripMargin)) { (s, dir) =>
    val rv = Tables.lineitem(s, dir)
      .join(Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_regionkey").as("trt"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(expr("year(l_shipdate) * 4" +
        " + (month(l_shipdate) - 1) div 3").as("blk"), col("trt"))
      .agg(sum(expr("CAST(l_extendedprice * 100 AS DECIMAL(38,0))"))
        .as("cents"))
      .materialize() // block×region dim
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("blk")).orderBy(col("cents"))
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy(col("blk"))
    val full = rv.withColumn("r", rank().over(w))
      .withColumn("k", count(lit(1)).over(wk))
      .where(col("k") === 5)
    val rj = full.groupBy(col("trt"))
      .agg(sum(col("r")).as("rsum"), count(lit(1)).as("b"))
    rj.agg(max(col("b")).as("b"), count(lit(1)).as("k"),
        sum(col("rsum") * col("rsum")).as("s2"))
      .select(col("b").as("n_blocks"), col("k").as("k_treatments"),
        col("s2").as("sum_ranksum_sq"),
        expr("""CAST(floor((12.0 * CAST(s2 AS DOUBLE)
             / (CAST(b AS DOUBLE) * CAST(k AS DOUBLE)
                * CAST(k + 1 AS DOUBLE))
             - 3.0 * CAST(b AS DOUBLE) * CAST(k + 1 AS DOUBLE))
             * 1000.0) AS BIGINT)""").as("chi2_milli"))
  }

  /** Jonckheere–Terpstra ordered-alternative test: does line QUANTITY
    * shift upward with the (ordered) discount level? JT = Σ_{i<j} U_ij
    * with every pairwise Mann–Whitney U computed from the discount ×
    * quantity HISTOGRAM (11 levels × 50 values — U_ij = Σ over value
    * pairs of n_iv·n_jw·[w > v] + ½·ties, doubled to stay integer).
    * The dose-response rank test the Cochran–Armitage face (q472)
    * lacks for ordinal RESPONSES. */
  def q687: Q = Q(
    "q687_jonckheere_terpstra",
    Some("""
      |WITH h AS (
      |  SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS g,
      |         CAST(floor(l_quantity + 0.5) AS BIGINT) AS v,
      |         count(*) AS c
      |  FROM lineitem GROUP BY 1, 2),
      |u2 AS (
      |  -- 2·U_ij summed over all ordered group pairs i < j:
      |  -- greater counts twice, ties once — exact integers
      |  SELECT sum(CASE WHEN b.v > a.v THEN 2 * a.c * b.c
      |                  WHEN b.v = a.v THEN a.c * b.c
      |                  ELSE 0 END) AS jt2
      |  FROM h a JOIN h b ON a.g < b.g),
      |mo AS (
      |  SELECT (SELECT sum(c) FROM h) AS n,
      |         (SELECT count(DISTINCT g) FROM h) AS k,
      |         (SELECT jt2 FROM u2) AS jt2,
      |         (SELECT sum(CAST(gc AS HUGEINT) * gc) FROM (
      |            SELECT g, sum(c) AS gc FROM h GROUP BY 1)) AS sg2)
      |SELECT CAST(n AS BIGINT) AS n_lines,
      |       CAST(k AS BIGINT) AS k_levels,
      |       CAST(jt2 AS BIGINT) AS jt_x2,
      |       CAST(floor((CAST(jt2 AS DOUBLE) / 2.0
      |            - (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
      |               - CAST(sg2 AS DOUBLE)) / 4.0) * 1000.0) AS BIGINT)
      |         AS centered_jt_milli
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    val h = Tables.lineitem(s, dir)
      .groupBy(expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)")
        .as("g"),
        expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("v"))
      .agg(count(lit(1)).as("c"))
      .materialize() // 11×50 histogram dim
    val u2 = h.as("a").join(h.as("b"), col("a.g") < col("b.g"))
      .agg(sum(when(col("b.v") > col("a.v"),
          lit(2L) * col("a.c").cast("decimal(38,0)") * col("b.c"))
        .when(col("b.v") === col("a.v"),
          col("a.c").cast("decimal(38,0)") * col("b.c"))
        .otherwise(lit(0L).cast("decimal(38,0)"))).as("jt2"))
    val gc = h.groupBy(col("g")).agg(sum(col("c")).as("gc"))
    val mo = h.agg(sum(col("c")).as("n"),
        countDistinct(col("g")).as("k"))
      .crossJoin(broadcast(u2))
      .crossJoin(broadcast(gc.agg(
        sum(col("gc").cast("decimal(38,0)") * col("gc")).as("sg2"))))
    mo.select(col("n").as("n_lines"), col("k").as("k_levels"),
      col("jt2").cast("long").as("jt_x2"),
      expr("""CAST(floor((CAST(jt2 AS DOUBLE) / 2.0
           - (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
              - CAST(sg2 AS DOUBLE)) / 4.0) * 1000.0) AS BIGINT)""")
        .as("centered_jt_milli"))
  }

  /** Page's L trend test: is there a MONOTONE quarter effect on
    * revenue within years? Quarters ranked within each year (4
    * treatments, year blocks), L = Σ_j j·R_j with the expected value
    * b·k(k+1)²/4 subtracted — positive centered L = revenue rises
    * through the year. Exact integers end-to-end. */
  def q688: Q = Q(
    "q688_page_trend",
    Some("""
      |WITH rv AS (
      |  SELECT year(l_shipdate) AS yr,
      |         (month(l_shipdate) - 1) // 3 + 1 AS q,
      |         sum(CAST(l_extendedprice * 100 AS HUGEINT)) AS cents
      |  FROM lineitem GROUP BY 1, 2),
      |rk AS (
      |  SELECT yr, q,
      |         rank() OVER (PARTITION BY yr ORDER BY cents) AS r,
      |         count(*) OVER (PARTITION BY yr) AS k
      |  FROM rv),
      |full_ AS (SELECT * FROM rk WHERE k = 4),
      |rj AS (SELECT q, sum(r) AS rsum FROM full_ GROUP BY 1),
      |st AS (
      |  SELECT sum(q * rsum) AS l,
      |         (SELECT count(DISTINCT yr) FROM full_) AS b
      |  FROM rj)
      |SELECT CAST(b AS BIGINT) AS n_years,
      |       CAST(l AS BIGINT) AS page_l,
      |       CAST(l - (b * 100) // 4 AS BIGINT) AS centered_l
      |FROM st
      |""".stripMargin)) { (s, dir) =>
    val rv = Tables.lineitem(s, dir)
      .groupBy(year(col("l_shipdate")).cast("long").as("yr"),
        expr("(month(l_shipdate) - 1) div 3 + 1").as("q"))
      .agg(sum(expr("CAST(l_extendedprice * 100 AS DECIMAL(38,0))"))
        .as("cents"))
      .materialize() // year×quarter dim
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("yr")).orderBy(col("cents"))
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy(col("yr"))
    val full = rv.withColumn("r", rank().over(w))
      .withColumn("k", count(lit(1)).over(wk))
      .where(col("k") === 4)
      .materialize()
    val b1 = full.select(col("yr")).distinct()
      .agg(count(lit(1)).as("b"))
    full.groupBy(col("q")).agg(sum(col("r")).as("rsum"))
      .agg(sum(col("q") * col("rsum")).as("l"))
      .crossJoin(broadcast(b1))
      .select(col("b").as("n_years"), col("l").as("page_l"),
        expr("CAST(l - (b * 100) div 4 AS BIGINT)").as("centered_l"))
  }

  /** Brunner–Munzel relative effect p̂ = P(X < Y) + ½P(X = Y) between
    * RETURNED and kept lines on quantity, from midranks over the
    * 50-value histogram — the heteroscedasticity-robust replacement
    * for Mann–Whitney when spreads differ. Exact rational p̂
    * (ppm-quantized): p̂ = (R̄_y − (n_y+1)/2)/n_x via histogram
    * midranks, every term integer. */
  def q689: Q = Q(
    "q689_brunner_munzel_effect",
    Some("""
      |WITH h AS (
      |  SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS v,
      |         sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS cy,
      |         sum(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) AS cx
      |  FROM lineitem GROUP BY 1),
      |mr AS (
      |  -- combined-sample midrank per value: before + (count+1)/2,
      |  -- doubled to stay integer (mr2 = 2·midrank)
      |  SELECT v, cy, cx,
      |         2 * (coalesce(sum(cy + cx) OVER (ORDER BY v
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |              0)) + (cy + cx) + 1 AS mr2
      |  FROM h),
      |mo AS (
      |  SELECT sum(cy) AS ny, sum(cx) AS nx,
      |         sum(CAST(cy AS HUGEINT) * mr2) AS sry2
      |  FROM mr)
      |SELECT CAST(nx AS BIGINT) AS n_kept,
      |       CAST(ny AS BIGINT) AS n_returned,
      |       CAST((1000000 * (sry2 - CAST(ny AS HUGEINT) * (ny + 1)))
      |            // (2 * CAST(nx AS HUGEINT) * ny) AS BIGINT)
      |         AS p_hat_ppm
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    val h = Tables.lineitem(s, dir)
      .groupBy(expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("v"))
      .agg(sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
        .as("cy"),
        sum(when(col("l_returnflag") === "R", 0L).otherwise(1L))
          .as("cx"))
      .materialize() // 50-value histogram
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val mr = h.withColumn("mr2",
      lit(2L) * coalesce(sum(col("cy") + col("cx")).over(w), lit(0L))
        + (col("cy") + col("cx")) + 1)
    mr.agg(sum(col("cy")).as("ny"), sum(col("cx")).as("nx"),
        sum(col("cy").cast("decimal(38,0)") * col("mr2")).as("sry2"))
      .select(col("nx").as("n_kept"), col("ny").as("n_returned"),
        expr("CAST((1000000 * (sry2 - CAST(ny AS DECIMAL(38,0)) * (ny + 1)))" +
          " div (2 * CAST(nx AS DECIMAL(38,0)) * ny) AS BIGINT)")
          .as("p_hat_ppm"))
  }

  /** Ansari–Bradley scale test between two brand price distributions
    * (Brand#11 vs Brand#55): scores min(r, N+1−r) from combined-sample
    * midranks over the cents-value histogram, AB = Σ scores of
    * sample 1 — small AB = sample 1 sits in the TAILS (wider scale).
    * The rank-based dispersion comparison that needs no normal-score
    * table (vs Fligner–Killeen); doubled scores keep ties exact. */
  def q690: Q = Q(
    "q690_ansari_bradley",
    Some("""
      |WITH x AS (
      |  SELECT CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS v,
      |         sum(CASE WHEN p_brand = 'Brand#11' THEN 1 ELSE 0 END)
      |           AS c1,
      |         sum(CASE WHEN p_brand = 'Brand#55' THEN 1 ELSE 0 END)
      |           AS c2
      |  FROM part WHERE p_brand IN ('Brand#11', 'Brand#55')
      |  GROUP BY 1),
      |mr AS (
      |  SELECT v, c1, c2,
      |         2 * (coalesce(sum(c1 + c2) OVER (ORDER BY v
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |              0)) + (c1 + c2) + 1 AS mr2,
      |         (SELECT sum(c1 + c2) FROM x) AS n
      |  FROM x),
      |sc AS (
      |  -- 2·score = min(mr2, 2(N+1) − mr2)
      |  SELECT c1, c2,
      |         CASE WHEN mr2 < 2 * (n + 1) - mr2 THEN mr2
      |              ELSE 2 * (n + 1) - mr2 END AS sc2
      |  FROM mr),
      |mo AS (SELECT sum(c1) AS n1, sum(c2) AS n2,
      |              sum(CAST(c1 AS HUGEINT) * sc2) AS ab2,
      |              sum(CAST((c1 + c2) AS HUGEINT) * sc2) AS tot2
      |       FROM sc)
      |SELECT CAST(n1 AS BIGINT) AS n_brand11,
      |       CAST(n2 AS BIGINT) AS n_brand55,
      |       CAST(ab2 AS BIGINT) AS ab_x2,
      |       CAST((1000000 * ab2) // tot2 AS BIGINT) AS ab_share_ppm
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    val x = Tables.part(s, dir)
      .where(col("p_brand").isin("Brand#11", "Brand#55"))
      .groupBy(expr("CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)")
        .as("v"))
      .agg(sum(when(col("p_brand") === "Brand#11", 1L).otherwise(0L))
        .as("c1"),
        sum(when(col("p_brand") === "Brand#55", 1L).otherwise(0L))
          .as("c2"))
      .materialize() // two-brand value histogram
    val n1f = x.agg(sum(col("c1") + col("c2")).as("n"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val mr = x.crossJoin(broadcast(n1f))
      .withColumn("mr2",
        lit(2L) * coalesce(sum(col("c1") + col("c2")).over(w), lit(0L))
          + (col("c1") + col("c2")) + 1)
    val sc = mr.select(col("c1"), col("c2"),
      when(col("mr2") < lit(2L) * (col("n") + 1) - col("mr2"), col("mr2"))
        .otherwise(lit(2L) * (col("n") + 1) - col("mr2")).as("sc2"))
    sc.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
        sum(col("c1").cast("decimal(38,0)") * col("sc2")).as("ab2"),
        sum((col("c1") + col("c2")).cast("decimal(38,0)") * col("sc2"))
          .as("tot2"))
      .select(col("n1").as("n_brand11"), col("n2").as("n_brand55"),
        col("ab2").cast("long").as("ab_x2"),
        expr("CAST((1000000 * ab2) div tot2 AS BIGINT)")
          .as("ab_share_ppm"))
  }
}
