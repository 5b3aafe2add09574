package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-9 segregation/exposure wave on the customer nation × market-
  * segment composition: isolation index, multigroup entropy
  * segregation (Theil's H), location quotients, the Krugman
  * specialization index, and the Gini segregation index — the
  * spatial-composition battery beyond the shipped Duncan
  * dissimilarity (q595) and Hoover (q625) faces. One fact pass builds
  * the 25×5 count grid; isolation/entropy terms are quantized PER
  * NATION before sums, LQ and Krugman are fully exact rationals, and
  * Gini segregation uses the exact 25×25 pair formula. */
object SegregationQueries {

  val all: Seq[Q] = Seq(q746, q747, q748, q749, q750)

  /** Oracle CTEs: grid `cg(nk, seg, c)`, nation totals `tn(nk, t)`,
    * segment totals `ts(seg, cg)`, grand total `gt(t)`. */
  private def sqlGrid: String = """
    |cg AS (
    |  SELECT c_nationkey AS nk, c_mktsegment AS seg,
    |         count(*) AS c
    |  FROM customer GROUP BY 1, 2),
    |tn AS (SELECT nk, sum(c) AS t FROM cg GROUP BY 1),
    |ts AS (SELECT seg, sum(c) AS cg FROM cg GROUP BY 1),
    |gt AS (SELECT sum(c) AS t FROM cg)""".stripMargin

  private def grid(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .groupBy(col("c_nationkey").as("nk"),
        col("c_mktsegment").as("seg"))
      .agg(count(lit(1)).as("c"))

  /** Isolation index per segment: the average own-group share a
    * member experiences, Σ_n (c/C_g)(c/T_n) — per-nation terms
    * pico-quantized before the sum; reported next to the global share
    * P_g (isolation ≥ share, the excess IS the segregation). */
  def q746: Q = Q(
    "q746_isolation_index",
    Some(s"""
      |WITH ${sqlGrid},
      |tm AS (
      |  SELECT cg.seg,
      |         sum((1000000000000 * CAST(cg.c AS HUGEINT) * cg.c)
      |             // (CAST(ts.cg AS HUGEINT) * tn.t)) AS iso12
      |  FROM cg JOIN tn USING (nk) JOIN ts USING (seg)
      |  GROUP BY 1)
      |SELECT tm.seg AS segment,
      |       CAST(ts.cg AS BIGINT) AS n_customers,
      |       CAST((1000000 * ts.cg) // gt.t AS BIGINT) AS share_ppm,
      |       CAST(tm.iso12 // 1000000 AS BIGINT) AS isolation_ppm
      |FROM tm JOIN ts ON ts.seg = tm.seg CROSS JOIN gt
      |ORDER BY segment
      |""".stripMargin)) { (s, dir) =>
    val cg = grid(s, dir).materialize()
    val tn = cg.groupBy(col("nk")).agg(sum(col("c")).as("t"))
    val ts = cg.groupBy(col("seg")).agg(sum(col("c")).as("cgt"))
    val gt = cg.agg(sum(col("c")).as("t"))
    cg.join(broadcast(tn), Seq("nk"))
      .join(broadcast(ts), Seq("seg"))
      .groupBy(col("seg"))
      .agg(sum(expr("(1000000000000 * CAST(c AS DECIMAL(38,0)) * c)" +
        " div (CAST(cgt AS DECIMAL(38,0)) * t)")).as("iso12"),
        max(col("cgt")).as("cgt"))
      .crossJoin(broadcast(gt))
      .select(col("seg").as("segment"),
        col("cgt").cast("long").as("n_customers"),
        expr("CAST((1000000 * cgt) div t AS BIGINT)").as("share_ppm"),
        expr("CAST(iso12 div 1000000 AS BIGINT)").as("isolation_ppm"))
      .orderBy(col("segment"))
  }

  /** Multigroup entropy segregation (Theil's H): global segment
    * entropy E vs the employment-weighted nation entropies,
    * H = Σ_n T_n(E−E_n)/(T·E). Per-nation entropy deficits are
    * nano-quantized before the sum; entropies are pinned doubles from
    * exact counts. */
  def q747: Q = Q(
    "q747_entropy_segregation",
    Some(s"""
      |WITH ${sqlGrid},
      |ge AS (
      |  SELECT sum(-(CAST(cg AS DOUBLE) / t)
      |             * ln(CAST(cg AS DOUBLE) / t)) AS e
      |  FROM ts CROSS JOIN gt),
      |ne AS (
      |  SELECT cg.nk, tn.t,
      |         sum(-(CAST(cg.c AS DOUBLE) / tn.t)
      |             * ln(CAST(cg.c AS DOUBLE) / tn.t)) AS en
      |  FROM cg JOIN tn USING (nk) GROUP BY 1, 2),
      |tm AS (
      |  SELECT sum(CAST(floor(CAST(ne.t AS DOUBLE) * (ge.e - ne.en)
      |             * 1000000000.0) AS HUGEINT)) AS a9
      |  FROM ne CROSS JOIN ge)
      |SELECT CAST(floor(ge.e * 1000000.0) AS BIGINT)
      |         AS global_entropy_micro,
      |       CAST(floor(CAST(tm.a9 AS DOUBLE)
      |            / (1000000000.0 * CAST(gt.t AS DOUBLE) * ge.e)
      |            * 1000000.0) AS BIGINT) AS theil_h_micro
      |FROM tm CROSS JOIN ge CROSS JOIN gt
      |""".stripMargin)) { (s, dir) =>
    val cg = grid(s, dir).materialize()
    val tn = cg.groupBy(col("nk")).agg(sum(col("c")).as("t"))
    val ts = cg.groupBy(col("seg")).agg(sum(col("c")).as("cgt"))
    val gt = cg.agg(sum(col("c")).as("t"))
    val ge = ts.crossJoin(broadcast(gt))
      .agg(sum(expr("-(CAST(cgt AS DOUBLE) / t)" +
        " * ln(CAST(cgt AS DOUBLE) / t)")).as("e"))
    val ne = cg.join(broadcast(tn), Seq("nk"))
      .groupBy(col("nk"), col("t"))
      .agg(sum(expr("-(CAST(c AS DOUBLE) / t)" +
        " * ln(CAST(c AS DOUBLE) / t)")).as("en"))
    val tm = ne.crossJoin(broadcast(ge))
      .agg(sum(expr("CAST(floor(CAST(t AS DOUBLE) * (e - en)" +
        " * 1000000000.0) AS DECIMAL(38,0))")).as("a9"))
    tm.crossJoin(broadcast(ge)).crossJoin(broadcast(gt))
      .select(
        expr("CAST(floor(e * 1000000.0) AS BIGINT)")
          .as("global_entropy_micro"),
        expr("CAST(floor(CAST(a9 AS DOUBLE)" +
          " / (1000000000.0 * CAST(t AS DOUBLE) * e)" +
          " * 1000000.0) AS BIGINT)").as("theil_h_micro"))
  }

  /** Location quotients: (c/T_n)/(C_g/T) as an exact rational ppm for
    * every grid cell; the 10 cells farthest from 1 are the
    * concentration callouts. */
  def q748: Q = Q(
    "q748_location_quotients",
    Some(s"""
      |WITH ${sqlGrid}
      |SELECT CAST(cg.nk AS BIGINT) AS nationkey, cg.seg AS segment,
      |       CAST(cg.c AS BIGINT) AS n_customers,
      |       CAST((1000000 * CAST(cg.c AS HUGEINT) * gt.t)
      |            // (CAST(tn.t AS HUGEINT) * ts.cg) AS BIGINT)
      |         AS lq_ppm
      |FROM cg JOIN tn USING (nk) JOIN ts USING (seg) CROSS JOIN gt
      |ORDER BY abs((1000000 * CAST(cg.c AS HUGEINT) * gt.t)
      |            // (CAST(tn.t AS HUGEINT) * ts.cg) - 1000000) DESC,
      |         nationkey, segment
      |LIMIT 10
      |""".stripMargin)) { (s, dir) =>
    val cg = grid(s, dir).materialize()
    val tn = cg.groupBy(col("nk")).agg(sum(col("c")).as("t"))
    val ts = cg.groupBy(col("seg")).agg(sum(col("c")).as("cgt"))
    val gt = cg.agg(sum(col("c")).as("gt"))
    cg.join(broadcast(tn), Seq("nk"))
      .join(broadcast(ts), Seq("seg"))
      .crossJoin(broadcast(gt))
      .select(col("nk").cast("long").as("nationkey"),
        col("seg").as("segment"),
        col("c").cast("long").as("n_customers"),
        expr("CAST((1000000 * CAST(c AS DECIMAL(38,0)) * gt)" +
          " div (CAST(t AS DECIMAL(38,0)) * cgt) AS BIGINT)")
          .as("lq_ppm"))
      .orderBy(abs(col("lq_ppm") - 1000000).desc, col("nationkey"),
        col("segment"))
      .limit(10)
  }

  /** Krugman specialization index per nation vs the rest-of-world
    * mix: K = Σ_g |c/T_n − (C_g−c)/(T−T_n)| — single-denominator
    * exact rational per nation (ppm), the "how unlike everyone else
    * is this nation's customer mix" audit. */
  def q749: Q = Q(
    "q749_krugman_specialization",
    Some(s"""
      |WITH ${sqlGrid},
      |km AS (
      |  SELECT cg.nk, tn.t,
      |         sum(abs(CAST(cg.c AS HUGEINT) * (gt.t - tn.t)
      |                 - CAST(ts.cg - cg.c AS HUGEINT) * tn.t))
      |           AS num,
      |         max(gt.t) AS gt
      |  FROM cg JOIN tn USING (nk) JOIN ts USING (seg) CROSS JOIN gt
      |  GROUP BY 1, 2)
      |SELECT CAST(nk AS BIGINT) AS nationkey,
      |       CAST(t AS BIGINT) AS n_customers,
      |       CAST((1000000 * num) // (CAST(t AS HUGEINT) * (gt - t))
      |            AS BIGINT) AS krugman_ppm
      |FROM km ORDER BY krugman_ppm DESC, nationkey
      |""".stripMargin)) { (s, dir) =>
    val cg = grid(s, dir).materialize()
    val tn = cg.groupBy(col("nk")).agg(sum(col("c")).as("t"))
    val ts = cg.groupBy(col("seg")).agg(sum(col("c")).as("cgt"))
    val gt = cg.agg(sum(col("c")).as("gt"))
    cg.join(broadcast(tn), Seq("nk"))
      .join(broadcast(ts), Seq("seg"))
      .crossJoin(broadcast(gt))
      .groupBy(col("nk"), col("t"))
      .agg(sum(abs(col("c").cast("decimal(38,0)")
          * (col("gt") - col("t"))
          - (col("cgt") - col("c")).cast("decimal(38,0)") * col("t")))
          .as("num"),
        max(col("gt")).as("gt"))
      .select(col("nk").cast("long").as("nationkey"),
        col("t").cast("long").as("n_customers"),
        expr("CAST((1000000 * num) div (CAST(t AS DECIMAL(38,0))" +
          " * (gt - t)) AS BIGINT)").as("krugman_ppm"))
      .orderBy(col("krugman_ppm").desc, col("nationkey"))
  }

  /** Gini segregation index for each segment vs the rest: the exact
    * pair formula Σ_n Σ_m |g_n r_m − g_m r_n| / (2 G R) over nation
    * pairs (25×25 per segment, fully integer) — the area-based
    * sibling of Duncan's D. */
  def q750: Q = Q(
    "q750_gini_segregation",
    Some(s"""
      |WITH ${sqlGrid},
      |gr AS (
      |  SELECT cg.seg, cg.nk, cg.c AS g, tn.t - cg.c AS r
      |  FROM cg JOIN tn USING (nk)),
      |pw AS (
      |  SELECT a.seg,
      |         sum(abs(CAST(a.g AS HUGEINT) * b.r
      |                 - CAST(b.g AS HUGEINT) * a.r)) AS num
      |  FROM gr a JOIN gr b ON a.seg = b.seg
      |  GROUP BY 1),
      |tt2 AS (
      |  SELECT seg, sum(g) AS gg, sum(r) AS rr FROM gr GROUP BY 1)
      |SELECT pw.seg AS segment,
      |       CAST((1000000 * pw.num)
      |            // (2 * CAST(tt2.gg AS HUGEINT) * tt2.rr) AS BIGINT)
      |         AS gini_seg_ppm
      |FROM pw JOIN tt2 ON tt2.seg = pw.seg
      |ORDER BY segment
      |""".stripMargin)) { (s, dir) =>
    val cg = grid(s, dir).materialize()
    val tn = cg.groupBy(col("nk")).agg(sum(col("c")).as("t"))
    val gr = cg.join(broadcast(tn), Seq("nk"))
      .select(col("seg"), col("nk"), col("c").as("g"),
        (col("t") - col("c")).as("r"))
      .materialize() // 25×5 dim feeds both sides of the pair join
    val a = gr.select(col("seg"), col("g").as("ga"), col("r").as("ra"))
    val b = gr.select(col("seg").as("segb"), col("g").as("gb"),
      col("r").as("rb"))
    val pw = a.join(b, col("seg") === col("segb"))
      .groupBy(col("seg"))
      .agg(sum(abs(col("ga").cast("decimal(38,0)") * col("rb")
        - col("gb").cast("decimal(38,0)") * col("ra"))).as("num"))
    val tt2 = gr.groupBy(col("seg"))
      .agg(sum(col("g")).as("gg"), sum(col("r")).as("rr"))
    pw.join(broadcast(tt2), Seq("seg"))
      .select(col("seg").as("segment"),
        expr("CAST((1000000 * num) div (2 * CAST(gg AS DECIMAL(38,0))" +
          " * rr) AS BIGINT)").as("gini_seg_ppm"))
      .orderBy(col("segment"))
  }
}
