package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Materialize.MatOps
import graft.Tables
import graft.functions.PolyHash
import graft.text.TextAnalysis
import PipelineQueries.sqlSaltedHash

/** Round-7 linkage-and-calibration wave: AMS second-moment sketching,
  * resource-allocation link prediction, Fellegi–Sunter record-linkage
  * weight estimation, t-closeness privacy audit, and Murphy's Brier
  * decomposition. Everything is exact integer/rational arithmetic —
  * the AMS signs come from the repo's salted PolyHash (replayed
  * bit-for-bit by the DuckDB oracle), the RA index uses 1e9//deg
  * integer reciprocals, and probabilities are permille-quantized
  * BEFORE any cross-engine comparison.
  */
object LinkageQueries {

  val all: Seq[Q] = Seq(q456, q457, q458, q459, q460)

  /** AMS (Alon–Matias–Szegedy) F₂ sketch of the corpus token-frequency
    * vector vs the exact second moment: 15 ±1-sign sketches from the
    * salted PolyHash parity, median-of-5-groups-of-3 (the classic
    * variance/confidence boosting), error reported in permille. The
    * sketch side only ever shuffles (token, count) — the estimate a
    * real engine would use to size a self-join without computing it.
    * F₂ and every Z_j are exact BIGINT sums. */
  def q456: Q = {
    val nSketch = 15
    Q("q456_ams_f2_sketch",
      Some(s"""
        |WITH tok AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
        |  FROM documents),
        |f AS (SELECT t, count(*) AS f FROM tok GROUP BY 1),
        |exact AS (SELECT count(*) AS n_tok, sum(f * f) AS f2 FROM f),
        |z AS (
        |  SELECT j.j,
        |         sum(f.f * (CASE WHEN (${sqlSaltedHash(
                   "(f.t || ':' || CAST(j.j AS VARCHAR))", "ams")}) % 2 = 0
        |                    THEN 1 ELSE -1 END)) AS z
        |  FROM f CROSS JOIN (SELECT unnest(range(1, $nSketch + 1)) AS j) j
        |  GROUP BY 1),
        |grp AS (SELECT (j - 1) // 3 AS g, sum(z * z) AS s
        |        FROM z GROUP BY 1),
        |med AS (
        |  SELECT s FROM (SELECT s, row_number() OVER (ORDER BY s) AS rn
        |                 FROM grp) r WHERE rn = 3)
        |SELECT CAST(exact.n_tok AS BIGINT) AS n_tokens,
        |       CAST(exact.f2 AS BIGINT) AS f2_exact,
        |       CAST(med.s // 3 AS BIGINT) AS f2_est,
        |       CAST((1000 * abs(med.s // 3 - exact.f2)) // exact.f2
        |            AS BIGINT) AS err_permille
        |FROM exact CROSS JOIN med
        |""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val f = Tables.documents(s, dir)
        .select(explode(TextAnalysis.tokens(col("text"))).as("t"))
        .groupBy(col("t")).agg(count(lit(1)).as("f"))
        .materialize() // 31-token dim: feeds exact F2 and all sketches
      val exact = f.agg(count(lit(1)).as("n_tokens"),
        sum(col("f") * col("f")).as("f2"))
      val js = (1 to nSketch).toDF("j")
      val z = f.crossJoin(broadcast(js))
        .select(col("j"),
          (col("f") * when(PolyHash.saltedHash(
              concat(col("t"), lit(":"), col("j").cast("string")), "ams")
              % 2 === 0, 1L).otherwise(-1L)).as("zf"))
        .groupBy(col("j")).agg(sum(col("zf")).as("z"))
      val grp = z.groupBy(expr("(j - 1) div 3").as("g"))
        .agg(sum(col("z") * col("z")).as("s"))
      val med = graft.operators.OrderStats.quantilesDisc(
          grp.withColumn("k", lit(0L)), Seq("k"), "s", Seq(500))
        .select(col("value").as("ms"))
      exact.crossJoin(broadcast(med))
        .select(col("n_tokens"), col("f2").as("f2_exact"),
          expr("ms div 3").as("f2_est"),
          expr("(1000 * abs(ms div 3 - f2)) div f2").as("err_permille"))
    }
  }

  /** Resource-allocation link prediction (Zhou–Lü–Zhang) on the
    * supplier co-purchase graph: suppliers that co-occur in orders
    * are edges (the shared scale-free [[SupplierGraph]]: support
    * above the 830‰ order statistic — 654 of 4950 pairs at sf0.01),
    * and every NON-adjacent pair is scored
    * RA = Σ_z 1/deg(z) over common neighbors z as exact integer
    * reciprocals (1e9 // deg). Top-20 predicted links. The supplier
    * dim is fixed-size, so the path-2 join is dim-bounded no matter
    * how large lineitem grows — the support aggregation is the only
    * fact-sized pass. */
  def q457: Q = {
    Q("q457_supplier_ra_links",
      Some(s"""
        |WITH ${SupplierGraph.sqlEdgeCtes},
        |ed AS (SELECT a, c FROM e UNION ALL SELECT c, a FROM e),
        |deg AS (SELECT a AS node, count(*) AS d FROM ed GROUP BY 1),
        |cand AS (
        |  SELECT e1.a AS a, e2.c AS b, count(*) AS n_common,
        |         sum(1000000000 // deg.d) AS ra
        |  FROM ed e1 JOIN ed e2 ON e1.c = e2.a
        |       JOIN deg ON deg.node = e1.c
        |  WHERE e1.a < e2.c
        |  GROUP BY 1, 2),
        |miss AS (
        |  SELECT cand.* FROM cand
        |  LEFT JOIN e ON e.a = cand.a AND e.c = cand.b
        |  WHERE e.a IS NULL)
        |SELECT CAST(a AS BIGINT) AS supp_a, CAST(b AS BIGINT) AS supp_b,
        |       CAST(n_common AS BIGINT) AS n_common,
        |       CAST(ra AS BIGINT) AS ra_score
        |FROM miss
        |ORDER BY ra_score DESC, supp_a, supp_b LIMIT 20
        |""".stripMargin)) { (s, dir) =>
      val e = SupplierGraph.edges(s, dir).select(col("a"), col("c"))
      val ed = e.unionAll(e.select(col("c").as("a"), col("a").as("c")))
      val deg = ed.groupBy(col("a").as("node")).agg(count(lit(1)).as("d"))
      val cand = ed.as("e1")
        .join(ed.as("e2"), col("e1.c") === col("e2.a"))
        .where(col("e1.a") < col("e2.c"))
        .join(broadcast(deg), col("node") === col("e1.c"))
        .groupBy(col("e1.a").as("a"), col("e2.c").as("b"))
        .agg(count(lit(1)).as("n_common"),
          sum(expr("1000000000 div d")).as("ra"))
      cand.join(e.select(col("a").as("ea"), col("c").as("ec")),
          col("a") === col("ea") && col("b") === col("ec"), "left_anti")
        .select(col("a").as("supp_a"), col("b").as("supp_b"),
          col("n_common"), col("ra").as("ra_score"))
        .orderBy(col("ra_score").desc, col("supp_a"), col("supp_b"))
        .limit(20)
    }
  }

  /** Fellegi–Sunter record-linkage weight estimation over size-blocked
    * part pairs: with "same p_type" as the (known-label) match
    * definition, estimate each comparison field's m = P(agree|match)
    * and u = P(agree|non-match) and the resulting agreement odds m/u —
    * the table a probabilistic matcher thresholds on. Blocking on
    * p_size keeps candidates quadratic only within a bounded block
    * (≤55 parts per size here), the standard linkage scale pattern.
    * All probabilities are exact permille integers. */
  def q458: Q = Q(
    "q458_fellegi_sunter_weights",
    Some("""
      |WITH p AS (
      |  SELECT p_partkey AS k, p_size AS sz, p_brand AS br, p_type AS ty,
      |         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS pc,
      |         string_split(p_name, ' ')[1] AS w1,
      |         string_split(p_type, ' ')[1] AS tw
      |  FROM part),
      |pairs AS (
      |  SELECT CASE WHEN x.ty = y.ty THEN 1 ELSE 0 END AS is_match,
      |         CASE WHEN x.br = y.br THEN 1 ELSE 0 END AS f_brand,
      |         CASE WHEN abs(x.pc - y.pc) <= 1000 THEN 1 ELSE 0 END
      |           AS f_price,
      |         CASE WHEN x.w1 = y.w1 THEN 1 ELSE 0 END AS f_name,
      |         CASE WHEN x.tw = y.tw THEN 1 ELSE 0 END AS f_tyw1
      |  FROM p x JOIN p y ON x.sz = y.sz AND x.k < y.k),
      |agg AS (
      |  SELECT count(*) AS n,
      |         sum(is_match) AS nm,
      |         sum(is_match * f_brand) AS mb, sum((1 - is_match) * f_brand) AS ub,
      |         sum(is_match * f_price) AS mp, sum((1 - is_match) * f_price) AS up,
      |         sum(is_match * f_name) AS mn_, sum((1 - is_match) * f_name) AS un,
      |         sum(is_match * f_tyw1) AS mt, sum((1 - is_match) * f_tyw1) AS ut
      |  FROM pairs)
      |SELECT field,
      |       CAST(n AS BIGINT) AS n_pairs, CAST(nm AS BIGINT) AS n_match,
      |       CAST((1000 * ma) // nm AS BIGINT) AS m_permille,
      |       CAST((1000 * ua) // (n - nm) AS BIGINT) AS u_permille,
      |       CAST((1000 * ((1000 * ma) // nm))
      |            // greatest((1000 * ua) // (n - nm), 1) AS BIGINT)
      |         AS mu_odds_milli
      |FROM (
      |  SELECT 'brand' AS field, n, nm, mb AS ma, ub AS ua FROM agg
      |  UNION ALL
      |  SELECT 'price10', n, nm, mp, up FROM agg
      |  UNION ALL
      |  SELECT 'name_w1', n, nm, mn_, un FROM agg
      |  UNION ALL
      |  SELECT 'type_w1', n, nm, mt, ut FROM agg)
      |ORDER BY field
      |""".stripMargin)) { (s, dir) =>
    val p = Tables.part(s, dir)
      .select(col("p_partkey").as("k"), col("p_size").as("sz"),
        col("p_brand").as("br"), col("p_type").as("ty"),
        expr("CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)").as("pc"),
        split(col("p_name"), " ").getItem(0).as("w1"),
        split(col("p_type"), " ").getItem(0).as("tw"))
    val pairs = p.as("x")
      .join(p.select(col("k").as("yk"), col("sz").as("ysz"),
          col("br").as("ybr"), col("ty").as("yty"),
          col("pc").as("ypc"), col("w1").as("yw1"),
          col("tw").as("ytw")),
        col("sz") === col("ysz") && col("k") < col("yk"))
      .select(
        when(col("ty") === col("yty"), 1L).otherwise(0L).as("is_match"),
        when(col("br") === col("ybr"), 1L).otherwise(0L).as("f_brand"),
        when(abs(col("pc") - col("ypc")) <= 1000, 1L).otherwise(0L)
          .as("f_price"),
        when(col("w1") === col("yw1"), 1L).otherwise(0L).as("f_name"),
        when(col("tw") === col("ytw"), 1L).otherwise(0L).as("f_tyw1"))
    val agg = pairs.agg(
      count(lit(1)).as("n"), sum(col("is_match")).as("nm"),
      sum(col("is_match") * col("f_brand")).as("mb"),
      sum((lit(1L) - col("is_match")) * col("f_brand")).as("ub"),
      sum(col("is_match") * col("f_price")).as("mp"),
      sum((lit(1L) - col("is_match")) * col("f_price")).as("up"),
      sum(col("is_match") * col("f_name")).as("mn_"),
      sum((lit(1L) - col("is_match")) * col("f_name")).as("un"),
      sum(col("is_match") * col("f_tyw1")).as("mt"),
      sum((lit(1L) - col("is_match")) * col("f_tyw1")).as("ut"))
      .materialize()
    val rows = agg.select(lit("brand").as("field"), col("n"), col("nm"),
        col("mb").as("ma"), col("ub").as("ua"))
      .unionAll(agg.select(lit("price10"), col("n"), col("nm"),
        col("mp"), col("up")))
      .unionAll(agg.select(lit("name_w1"), col("n"), col("nm"),
        col("mn_"), col("un")))
      .unionAll(agg.select(lit("type_w1"), col("n"), col("nm"),
        col("mt"), col("ut")))
    rows.select(col("field"), col("n").as("n_pairs"),
        col("nm").as("n_match"),
        expr("(1000 * ma) div nm").as("m_permille"),
        expr("(1000 * ua) div (n - nm)").as("u_permille"),
        expr("(1000 * ((1000 * ma) div nm)) div " +
          "greatest((1000 * ua) div (n - nm), 1)").as("mu_odds_milli"))
      .orderBy(col("field"))
  }

  /** t-closeness audit: for each quasi-identifier class (market
    * segment × nation) of customers, the ordered earth-mover distance
    * between the class's account-balance-quintile distribution and the
    * global one — max-t is what a privacy reviewer checks before
    * release. Quintile boundaries are exact order statistics
    * (percentile_disc ranks ⌈p·n/1000⌉), and the EMD is exact integer
    * arithmetic over common denominators (|cumc·N − cumg·Nc| summed,
    * normalized by Nc·N·(B−1)). Ten least-private classes reported. */
  def q459: Q = Q(
    "q459_t_closeness_audit",
    Some("""
      |WITH c AS (
      |  SELECT c_mktsegment AS seg, c_nationkey AS nat, c_acctbal AS v
      |  FROM customer),
      |rk AS (SELECT v, row_number() OVER (ORDER BY v) AS rn,
      |              count(*) OVER () AS n FROM c),
      |qb AS (
      |  SELECT max(CASE WHEN rn = (200 * n + 999) // 1000 THEN v END) AS q1,
      |         max(CASE WHEN rn = (400 * n + 999) // 1000 THEN v END) AS q2,
      |         max(CASE WHEN rn = (600 * n + 999) // 1000 THEN v END) AS q3,
      |         max(CASE WHEN rn = (800 * n + 999) // 1000 THEN v END) AS q4
      |  FROM rk),
      |bkt AS (
      |  SELECT seg, nat,
      |         1 + CASE WHEN v > q1 THEN 1 ELSE 0 END
      |           + CASE WHEN v > q2 THEN 1 ELSE 0 END
      |           + CASE WHEN v > q3 THEN 1 ELSE 0 END
      |           + CASE WHEN v > q4 THEN 1 ELSE 0 END AS b
      |  FROM c CROSS JOIN qb),
      |g AS (SELECT b, count(*) AS gb FROM bkt GROUP BY 1),
      |gn AS (SELECT sum(gb) AS n FROM g),
      |cls AS (SELECT DISTINCT seg, nat FROM bkt),
      |cb AS (
      |  SELECT cls.seg, cls.nat, g.b,
      |         (SELECT count(*) FROM bkt
      |          WHERE bkt.seg = cls.seg AND bkt.nat = cls.nat
      |            AND bkt.b = g.b) AS cb
      |  FROM cls CROSS JOIN (SELECT DISTINCT b FROM g) g),
      |cum AS (
      |  SELECT seg, nat, b,
      |         sum(cb) OVER (PARTITION BY seg, nat ORDER BY b) AS cumc,
      |         sum(cb) OVER (PARTITION BY seg, nat) AS nc
      |  FROM cb),
      |gcum AS (SELECT b, sum(gb) OVER (ORDER BY b) AS cumg FROM g),
      |t AS (
      |  SELECT cum.seg, cum.nat, max(cum.nc) AS nc,
      |         sum(CASE WHEN cum.b < 5
      |             THEN abs(cum.cumc * gn.n - gcum.cumg * cum.nc)
      |             ELSE 0 END) AS s
      |  FROM cum JOIN gcum ON cum.b = gcum.b CROSS JOIN gn
      |  GROUP BY 1, 2)
      |SELECT seg AS segment, CAST(nat AS BIGINT) AS nationkey,
      |       CAST(nc AS BIGINT) AS n_class,
      |       CAST((1000 * s) // (nc * (SELECT n FROM gn) * 4) AS BIGINT)
      |         AS t_permille
      |FROM t
      |ORDER BY t_permille DESC, segment, nationkey LIMIT 10
      |""".stripMargin)) { (s, dir) =>
    val c = Tables.customer(s, dir)
      .select(col("c_mktsegment").as("seg"), col("c_nationkey").as("nat"),
        col("c_acctbal").as("v"))
      .materialize() // feeds boundaries, classes, buckets
    val qs = graft.operators.OrderStats.quantilesDisc(
        c.withColumn("k", lit(0L)), Seq("k"), "v", Seq(200, 400, 600, 800))
    val qb = qs.groupBy(col("k"))
      .agg(max(when(col("permille") === 200, col("value"))).as("q1"),
        max(when(col("permille") === 400, col("value"))).as("q2"),
        max(when(col("permille") === 600, col("value"))).as("q3"),
        max(when(col("permille") === 800, col("value"))).as("q4"))
      .drop("k")
    val bkt = c.crossJoin(broadcast(qb))
      .select(col("seg"), col("nat"),
        (lit(1) + when(col("v") > col("q1"), 1).otherwise(0)
          + when(col("v") > col("q2"), 1).otherwise(0)
          + when(col("v") > col("q3"), 1).otherwise(0)
          + when(col("v") > col("q4"), 1).otherwise(0)).as("b"))
      .materialize()
    val g = bkt.groupBy(col("b")).agg(count(lit(1)).as("gb"))
    val gn = g.agg(sum(col("gb")).as("n"))
    val cls = bkt.select(col("seg"), col("nat")).distinct()
    val cb = cls.crossJoin(broadcast(g.select(col("b"))))
      .join(bkt.groupBy(col("seg"), col("nat"), col("b"))
          .agg(count(lit(1)).as("cb"))
          .withColumnRenamed("seg", "jseg")
          .withColumnRenamed("nat", "jnat")
          .withColumnRenamed("b", "jb"),
        col("seg") === col("jseg") && col("nat") === col("jnat")
          && col("b") === col("jb"), "left")
      .select(col("seg"), col("nat"), col("b"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val wC = Window.partitionBy(col("seg"), col("nat")).orderBy(col("b"))
    val wN = Window.partitionBy(col("seg"), col("nat"))
    val cum = cb
      .withColumn("cumc", sum(col("cb")).over(wC))
      .withColumn("nc", sum(col("cb")).over(wN))
    val gcum = g
      .withColumn("cumg", sum(col("gb")).over(
        Window.orderBy(col("b")))) // 5-bucket dim
      .select(col("b").as("gb_b"), col("cumg"))
    cum.join(broadcast(gcum), col("b") === col("gb_b"))
      .crossJoin(broadcast(gn))
      .groupBy(col("seg"), col("nat"))
      .agg(max(col("nc")).as("nc"), max(col("n")).as("n"),
        sum(when(col("b") < 5,
          abs(col("cumc") * col("n") - col("cumg") * col("nc")))
          .otherwise(0L)).as("s"))
      .select(col("seg").as("segment"),
        col("nat").cast("long").as("nationkey"),
        col("nc").as("n_class"),
        expr("(1000 * s) div (nc * n * 4)").as("t_permille"))
      .orderBy(col("t_permille").desc, col("segment"), col("nationkey"))
      .limit(10)
  }

  /** Murphy decomposition of the Brier score for a calibrated-by-
    *-history predictor: per-discount-level return rates learned on
    * shipments through 1997 predict 1998+ returns; Brier = reliability
    * − resolution + uncertainty diagnosed per component. Predictions
    * are permille-quantized BEFORE evaluation (the quantization is the
    * published contract, not a comparison hack), so every term is
    * exact integer arithmetic in permille² (micro) units. */
  def q460: Q = Q(
    "q460_brier_decomposition",
    Some("""
      |WITH l AS (
      |  SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS b,
      |         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
      |         year(l_shipdate) AS yr
      |  FROM lineitem),
      |tr AS (SELECT b, (1000 * sum(y)) // count(*) AS p
      |       FROM l WHERE yr <= 1997 GROUP BY 1),
      |ev AS (SELECT b, count(*) AS ne, sum(y) AS y1
      |       FROM l WHERE yr >= 1998 GROUP BY 1),
      |j AS (
      |  SELECT ev.b, ev.ne, ev.y1, tr.p,
      |         (1000 * ev.y1) // ev.ne AS yb
      |  FROM ev JOIN tr ON ev.b = tr.b),
      |tot AS (SELECT sum(ne) AS n, sum(y1) AS ytot FROM j),
      |terms AS (
      |  SELECT sum(ne * p * p - 2 * p * 1000 * y1 + 1000000 * y1) AS se,
      |         sum(ne * (p - yb) * (p - yb)) AS rel,
      |         sum(ne * (yb - (1000 * tot.ytot) // tot.n)
      |                * (yb - (1000 * tot.ytot) // tot.n)) AS res,
      |         max((1000 * tot.ytot) // tot.n) AS ybar
      |  FROM j CROSS JOIN tot)
      |SELECT CAST(tot.n AS BIGINT) AS n_eval,
      |       CAST(terms.se // tot.n AS BIGINT) AS brier_micro,
      |       CAST(terms.rel // tot.n AS BIGINT) AS rel_micro,
      |       CAST(terms.res // tot.n AS BIGINT) AS res_micro,
      |       CAST((terms.ybar * (1000 - terms.ybar)) AS BIGINT)
      |         AS unc_micro
      |FROM tot CROSS JOIN terms
      |""".stripMargin)) { (s, dir) =>
    val l = Tables.lineitem(s, dir)
      .select(expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)").as("b"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"),
        year(col("l_shipdate")).as("yr"))
      .materialize()
    val tr = l.where(col("yr") <= 1997).groupBy(col("b"))
      .agg(expr("(1000 * sum(y)) div count(1)").as("p"))
    val ev = l.where(col("yr") >= 1998).groupBy(col("b"))
      .agg(count(lit(1)).as("ne"), sum(col("y")).as("y1"))
    val j = ev.join(broadcast(tr.withColumnRenamed("b", "tb")),
        col("b") === col("tb"))
      .select(col("b"), col("ne"), col("y1"), col("p"),
        expr("(1000 * y1) div ne").as("yb"))
      .materialize() // 11-row dim: feeds totals and terms
    val tot = j.agg(sum(col("ne")).as("n"), sum(col("y1")).as("ytot"))
    j.crossJoin(broadcast(tot))
      .agg(max(col("n")).as("n"),
        sum(expr("ne * p * p - 2 * p * 1000 * y1 + 1000000 * y1")).as("se"),
        sum(expr("ne * (p - yb) * (p - yb)")).as("rel"),
        sum(expr("ne * (yb - (1000 * ytot) div n) " +
          "* (yb - (1000 * ytot) div n)")).as("res"),
        max(expr("(1000 * ytot) div n")).as("ybar"))
      .select(col("n").as("n_eval"),
        expr("se div n").as("brier_micro"),
        expr("rel div n").as("rel_micro"),
        expr("res div n").as("res_micro"),
        expr("ybar * (1000 - ybar)").as("unc_micro"))
  }
}
