package graft.queries

import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables
import graft.text.TextAnalysis
import CorpusQueries.sqlQualityExpr
import PipelineQueries.{sqlInList, sqlTokens}

/** Round-7 resampling-and-inference wave: deterministic-LCG bootstrap
  * confidence intervals, closed-form jackknife standard errors,
  * capture-recapture population estimation, hypergeometric enrichment
  * z-scores, and an SPT scheduling what-if — the uncertainty-
  * quantification faces, every random draw replaced by the q31 LCG
  * so both engines replay identical "randomness". */
object InferenceQueries {

  val all: Seq[Q] = Seq(q436, q437, q438, q439, q440, q441, q442, q443,
    q444, q445, q446, q447, q448, q449, q450)

  /** Bootstrap CI for mean daily revenue: 50 replicates resample the
    * day dim with the q31 LCG (seed = b·100003 + j — pure integer,
    * identical in both engines), each replicate mean is an exact
    * integer division, and the percentile CI picks the 25‰/975‰
    * replicate order statistics. No floating randomness anywhere. */
  def q436: Q = {
    val nBoot = 50
    val idx = "1 + ((1103515245 * (b * 100003 + j) + 12345)" +
      " % 2147483648) % n"
    Q("q436_bootstrap_mean_ci",
      Some(s"""
        |WITH daily AS (
        |  SELECT epoch_us(l_shipdate) // 86400000000 AS d,
        |         CAST(sum(CAST(l_extendedprice * 100 AS HUGEINT))
        |              AS BIGINT) AS x
        |  FROM lineitem GROUP BY 1),
        |ix AS (SELECT x, row_number() OVER (ORDER BY d) AS i,
        |              count(*) OVER () AS n
        |       FROM daily),
        |grid AS (
        |  SELECT b.b, j.j, (SELECT max(n) FROM ix) AS n
        |  FROM (SELECT unnest(range(1, $nBoot + 1)) AS b) b
        |  CROSS JOIN (SELECT unnest(range(1,
        |    (SELECT max(n) FROM ix) + 1)) AS j) j),
        |draw AS (SELECT b, $idx AS pick FROM grid),
        |rm AS (
        |  SELECT draw.b, sum(ix.x) // count(*) AS mean_cents
        |  FROM draw JOIN ix ON ix.i = draw.pick
        |  GROUP BY 1),
        |rk AS (
        |  SELECT mean_cents,
        |         row_number() OVER (ORDER BY mean_cents) AS rn
        |  FROM rm),
        |base AS (SELECT sum(x) // count(*) AS mean_cents,
        |                count(*) AS n_days FROM daily)
        |SELECT CAST(base.n_days AS BIGINT) AS n_days,
        |       CAST($nBoot AS BIGINT) AS n_boot,
        |       CAST(base.mean_cents AS BIGINT) AS mean_cents,
        |       (SELECT CAST(mean_cents AS BIGINT) FROM rk
        |        WHERE rn = (25 * $nBoot + 999) // 1000) AS ci_lo_cents,
        |       (SELECT CAST(mean_cents AS BIGINT) FROM rk
        |        WHERE rn = (975 * $nBoot + 999) // 1000) AS ci_hi_cents
        |FROM base
        |""".stripMargin)) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.lineitem(s, dir)
        .groupBy(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) " +
          "div 86400000000").as("d"))
        .agg(expr("CAST(sum(CAST(l_extendedprice * 100 " +
          "AS DECIMAL(38,0))) AS BIGINT)").as("x"))
      // day dim is calendar-bounded → index window + scalar n fine
      val ix = daily
        .withColumn("i", row_number().over(Window.orderBy(col("d")))
          .cast("long"))
        .select(col("i"), col("x"))
        .materialize() // feeds the draws, the base mean, and n
      val nRow = ix.agg(count(lit(1)).as("n"),
        expr("sum(x) div count(1)").as("mean_cents"))
      val bs = s.range(1, nBoot + 1).select(col("id").as("b"))
      val js = ix.select(col("i").as("j"))
      val draw = bs.crossJoin(js).crossJoin(broadcast(nRow))
        .select(col("b"), expr(idx).as("pick"))
      val rm = draw.join(ix, col("i") === col("pick"))
        .groupBy(col("b"))
        .agg(expr("sum(x) div count(1)").as("mean_cents"))
      val sel = graft.operators.OrderStats.quantilesDisc(
        rm.withColumn("g", lit(0L)), Seq("g"), "mean_cents",
        Seq(25, 975))
      val lo = sel.where(col("permille") === 25)
        .select(col("value").as("ci_lo_cents"))
      val hi = sel.where(col("permille") === 975)
        .select(col("value").as("ci_hi_cents"))
      nRow.crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
        .select(col("n").as("n_days"), lit(nBoot.toLong).as("n_boot"),
          col("mean_cents"), col("ci_lo_cents"), col("ci_hi_cents"))
    }
  }

  /** Jackknife standard error of the price-weighted mean discount
    * (a RATIO of sums, where leave-one-out has a closed form):
    * each line's pseudo-value n·R − (n−1)·R₍ᵢ₎ is micro-quantized,
    * then the SE comes from exact integer moments of the quantized
    * pseudo-values — the delete-one resampling plan with zero
    * re-passes over the data. */
  def q437: Q = {
    val rFrag = "(CAST(sdy AS DOUBLE) / CAST(sp AS DOUBLE))"
    val looFrag = "((CAST(sdy AS DOUBLE) - CAST(dy AS DOUBLE))" +
      " / (CAST(sp AS DOUBLE) - CAST(p AS DOUBLE)))"
    val pv = s"CAST(floor(CAST(1000000.0 * (CAST(n AS DOUBLE) * $rFrag" +
      s" - (CAST(n AS DOUBLE) - 1.0) * $looFrag)" +
      " AS DECIMAL(28,6))) AS BIGINT)"
    val se = "CAST(floor(CAST(sqrt(" +
      "(CAST(np AS DOUBLE) * CAST(spp AS DOUBLE)" +
      " - CAST(sp_ AS DOUBLE) * CAST(sp_ AS DOUBLE))" +
      " / (CAST(np AS DOUBLE) * CAST(np AS DOUBLE)" +
      " * (CAST(np AS DOUBLE) - 1.0)))" +
      " AS DECIMAL(28,6))) AS BIGINT)"
    Q("q437_jackknife_discount_se",
      Some(s"""
        |WITH v AS (
        |  SELECT CAST(l_extendedprice * 100 AS BIGINT) AS p,
        |         CAST(l_discount * 1000 AS BIGINT)
        |           * CAST(l_extendedprice * 100 AS BIGINT) AS dy
        |  FROM lineitem),
        |t AS (SELECT count(*) AS n, CAST(sum(p) AS BIGINT) AS sp,
        |             CAST(sum(dy) AS BIGINT) AS sdy FROM v),
        |pvs AS (SELECT $pv AS pv FROM v CROSS JOIN t),
        |m AS (
        |  SELECT count(*) AS np, sum(pv) AS sp_,
        |         sum(CAST(pv AS HUGEINT) * pv) AS spp
        |  FROM pvs),
        |r AS (SELECT t.n, CAST(floor(CAST(1000000.0 * $rFrag
        |        AS DECIMAL(28,6))) AS BIGINT) AS r_micro FROM t)
        |SELECT CAST(r.n AS BIGINT) AS n_lines, r.r_micro,
        |       $se AS se_micro
        |FROM m CROSS JOIN r
        |""".stripMargin)) { (s, dir) =>
      val d38 = "decimal(38,0)"
      val v = Tables.lineitem(s, dir)
        .select((col("l_extendedprice") * 100).cast(d38).cast("long")
          .as("p"),
          ((col("l_discount") * 1000).cast(d38).cast("long")
            * (col("l_extendedprice") * 100).cast(d38).cast("long"))
            .as("dy"))
        .materialize() // line fact feeds totals AND pseudo-values
      val t = v.agg(count(lit(1)).as("n"), sum(col("p")).as("sp"),
        sum(col("dy")).as("sdy"))
      val m = v.crossJoin(broadcast(t))
        .select(expr(pv).as("pv"))
        .agg(count(lit(1)).as("np"), sum(col("pv")).as("sp_"),
          sum(col("pv").cast(d38) * col("pv")).cast(d38).as("spp"))
      val r = t.select(col("n"),
        expr(s"CAST(floor(CAST(1000000.0 * $rFrag AS DECIMAL(28,6))) " +
          "AS BIGINT)").as("r_micro"))
      m.crossJoin(broadcast(r))
        .select(col("n").as("n_lines"), col("r_micro"),
          expr(se).as("se_micro"))
    }
  }

  /** Capture-recapture population estimate: users active in the first
    * 15 event days are "marked", the second 15 days are the recapture
    * sample, and Chapman's estimator (M+1)(C+1)/(R+1) − 1 sizes the
    * population — checked against the true distinct-user count the
    * estimator never saw. All integer. */
  def q438: Q = Q(
    "q438_capture_recapture",
    Some("""
      |WITH e AS (
      |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS d
      |  FROM events),
      |t AS (SELECT min(d) AS d0 FROM e),
      |m AS (SELECT DISTINCT user_id FROM e CROSS JOIN t
      |      WHERE d - t.d0 < 15),
      |c AS (SELECT DISTINCT user_id FROM e CROSS JOIN t
      |      WHERE d - t.d0 >= 15),
      |s AS (
      |  SELECT (SELECT count(*) FROM m) AS mm,
      |         (SELECT count(*) FROM c) AS cc,
      |         (SELECT count(*) FROM m JOIN c USING (user_id)) AS rr,
      |         (SELECT count(DISTINCT user_id) FROM e) AS tru)
      |SELECT CAST(mm AS BIGINT) AS n_marked,
      |       CAST(cc AS BIGINT) AS n_sample,
      |       CAST(rr AS BIGINT) AS n_recaptured,
      |       CAST((mm + 1) * (cc + 1) // (rr + 1) - 1 AS BIGINT)
      |         AS n_hat,
      |       CAST(tru AS BIGINT) AS n_true
      |FROM s
      |""".stripMargin)) { (s, dir) =>
    val e = Tables.events(s, dir)
      .select(col("user_id"), expr("ts div 86400000000000").as("d"))
      .materialize() // feeds the split, both samples, and the truth
    val t = e.agg(min(col("d")).as("d0"))
    val marked = e.crossJoin(broadcast(t))
      .where(col("d") - col("d0") < 15)
      .select(col("user_id")).distinct()
      .materialize()
    val sample = e.crossJoin(broadcast(t))
      .where(col("d") - col("d0") >= 15)
      .select(col("user_id").as("__su")).distinct()
      .materialize()
    val mm = marked.agg(count(lit(1)).as("mm"))
    val cc = sample.agg(count(lit(1)).as("cc"))
    val rr = marked.join(sample, col("user_id") === col("__su"))
      .agg(count(lit(1)).as("rr"))
    val tru = e.agg(countDistinct(col("user_id")).as("tru"))
    mm.crossJoin(broadcast(cc)).crossJoin(broadcast(rr))
      .crossJoin(broadcast(tru))
      .select(col("mm").as("n_marked"), col("cc").as("n_sample"),
        col("rr").as("n_recaptured"),
        expr("CAST((mm + 1) * (cc + 1) div (rr + 1) - 1 AS BIGINT)")
          .as("n_hat"),
        col("tru").as("n_true"))
  }

  /** Hypergeometric enrichment of returns per brand: is a brand
    * over-represented among returned lines? z = (k − n·K/N) /
    * √(n·(K/N)(1−K/N)(N−n)/(N−1)) — the GSEA-style over-
    * representation score from exact population counts, one shared
    * double fragment. */
  def q439: Q = {
    val kn = "(CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE))"
    val exp_ = s"(CAST(n AS DOUBLE) * $kn)"
    val z = s"((CAST(k AS DOUBLE) - $exp_)" +
      s" / sqrt(CAST(n AS DOUBLE) * $kn * (1.0 - $kn)" +
      " * (CAST(nn AS DOUBLE) - CAST(n AS DOUBLE))" +
      " / (CAST(nn AS DOUBLE) - 1.0)))"
    def qm(x: String) =
      s"CAST(floor(CAST(($x) * 1000 AS DECIMAL(28,6))) AS BIGINT)"
    Q("q439_return_enrichment",
      Some(s"""
        |WITH v AS (
        |  SELECT p.p_brand AS brand,
        |         CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS r
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
        |t AS (SELECT count(*) AS nn, sum(r) AS kk FROM v),
        |g AS (SELECT brand, count(*) AS n, sum(r) AS k FROM v
        |      GROUP BY 1)
        |SELECT g.brand, CAST(g.n AS BIGINT) AS n_lines,
        |       CAST(g.k AS BIGINT) AS n_returned,
        |       ${qm(exp_)} AS expected_milli,
        |       ${qm(z)} AS z_milli
        |FROM g CROSS JOIN t ORDER BY g.brand
        |""".stripMargin)) { (s, dir) =>
      val v = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)),
          col("p_partkey") === col("l_partkey"))
        .select(col("p_brand").as("brand"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("r"))
        .materialize() // one projection feeds totals AND groups
      val t = v.agg(count(lit(1)).as("nn"), sum(col("r")).as("kk"))
      v.groupBy(col("brand"))
        .agg(count(lit(1)).as("n"), sum(col("r")).as("k"))
        .crossJoin(broadcast(t))
        .select(col("brand"), col("n").as("n_lines"),
          col("k").as("n_returned"),
          expr(qm(exp_)).as("expected_milli"),
          expr(qm(z)).as("z_milli"))
        .orderBy(col("brand"))
    }
  }

  /** Shortest-processing-time scheduling what-if: 1998's orders as
    * jobs (processing time = line count, weight = order value), the
    * weighted total completion time Σw·C under SPT vs FIFO ordering —
    * both completion-time walks ride bucket-parallel globalRankCum
    * (no fact-sized total-order window), products in DECIMAL, and
    * the classic SPT-optimality gap lands as one ratio. */
  def q440: Q = Q(
    "q440_spt_scheduling",
    Some("""
      |WITH j AS (
      |  SELECT o.o_orderkey AS job,
      |         epoch_us(o.o_orderdate) // 86400000000 AS d,
      |         CAST(count(*) AS BIGINT) AS p,
      |         CAST(o.o_totalprice * 100 AS BIGINT) AS w
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  WHERE year(o.o_orderdate) = 1998
      |  GROUP BY 1, 2, o.o_totalprice),
      |spt AS (
      |  SELECT job, w,
      |         sum(p) OVER (ORDER BY p, job) AS c
      |  FROM j),
      |fifo AS (
      |  SELECT job, w,
      |         sum(p) OVER (ORDER BY d, job) AS c
      |  FROM j),
      |agg AS (
      |  SELECT
      |    (SELECT sum(CAST(w AS HUGEINT) * c) FROM spt) AS wc_spt,
      |    (SELECT sum(CAST(w AS HUGEINT) * c) FROM fifo) AS wc_fifo,
      |    (SELECT count(*) FROM j) AS n_jobs,
      |    (SELECT sum(p) FROM j) AS total_p)
      |SELECT CAST(n_jobs AS BIGINT) AS n_jobs,
      |       CAST(total_p AS BIGINT) AS total_p,
      |       CAST(wc_spt // 1000000 AS BIGINT) AS wc_spt_m,
      |       CAST(wc_fifo // 1000000 AS BIGINT) AS wc_fifo_m,
      |       CAST((1000 * wc_spt) // wc_fifo AS BIGINT) AS ratio_milli
      |FROM agg
      |""".stripMargin)) { (s, dir) =>
    val d38 = "decimal(38,0)"
    val j = Tables.orders(s, dir)
      .where(year(col("o_orderdate")) === 1998)
      .join(Tables.lineitem(s, dir)
        .select(col("l_orderkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey").as("job"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) " +
          "div 86400000000").as("d"),
        (col("o_totalprice") * 100).cast(d38).cast("long").as("w"))
      .agg(count(lit(1)).as("p"))
      .select(col("job"), col("d"), col("p"), col("w"))
      .materialize() // job dim feeds both orderings and totals
    def wc(bucket: org.apache.spark.sql.Column,
        ties: Seq[String]): org.apache.spark.sql.DataFrame =
      graft.dedup.SortedNeighborhood.globalRankCum(
        j.withColumn("__bkt", bucket), idCol = "job",
        bucketCol = "__bkt", tieCols = ties, cumCol = Some("p"))
        .select((col("w").cast(d38) * col("__cum")).as("wci"))
        .agg(sum(col("wci")).cast(d38).as("wc"))
    val spt = wc(col("p"), Nil)
      .select(col("wc").as("wc_spt"))
    val fifo = wc(col("d"), Nil)
      .select(col("wc").as("wc_fifo"))
    val tot = j.agg(count(lit(1)).as("n_jobs"), sum(col("p")).as("total_p"))
    tot.crossJoin(broadcast(spt)).crossJoin(broadcast(fifo))
      .select(col("n_jobs"), col("total_p"),
        expr("CAST(wc_spt div 1000000 AS BIGINT)").as("wc_spt_m"),
        expr("CAST(wc_fifo div 1000000 AS BIGINT)").as("wc_fifo_m"),
        expr("CAST((1000 * wc_spt) div wc_fifo AS BIGINT)")
          .as("ratio_milli"))
  }

  /** Intraclass correlation + design effect of customer clustering:
    * one-way random-effects ANOVA over order values grouped by
    * customer (per-group S²/n terms micro-quantized before the sums,
    * so both engines add the same integers), ICC =
    * (MSB − MSW)/(MSB + (n₀−1)·MSW), deff = 1 + (m̄−1)·ICC — "how
    * much do customer clusters inflate a sampled estimate's
    * variance". */
  def q441: Q = {
    val msb = "(CAST(ssb AS DOUBLE) / (CAST(k AS DOUBLE) - 1.0))"
    val msw = "((CAST(sst AS DOUBLE) - CAST(ssb AS DOUBLE))" +
      " / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)))"
    val n0 = "((CAST(nn AS DOUBLE)" +
      " - CAST(sn2 AS DOUBLE) / CAST(nn AS DOUBLE))" +
      " / (CAST(k AS DOUBLE) - 1.0))"
    val icc = s"(($msb - $msw) / ($msb + ($n0 - 1.0) * $msw))"
    val deff = s"(1.0 + (CAST(nn AS DOUBLE) / CAST(k AS DOUBLE) - 1.0)" +
      s" * $icc)"
    def qm(x: String, scale: String) =
      s"CAST(floor(CAST(($x) * $scale AS DECIMAL(28,6))) AS BIGINT)"
    Q("q441_icc_design_effect",
      Some(s"""
        |WITH v AS (
        |  SELECT o_custkey AS g,
        |         CAST(o_totalprice * 100 AS BIGINT) // 100 AS y
        |  FROM orders),
        |gg AS (
        |  SELECT g, count(*) AS n, CAST(sum(y) AS BIGINT) AS sy
        |  FROM v GROUP BY 1),
        |gt AS (
        |  SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS nn,
        |         CAST(sum(sy) AS BIGINT) AS s,
        |         sum(CAST(n AS HUGEINT) * n) AS sn2,
        |         sum(CAST(floor(CAST(
        |           CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
        |           / CAST(n AS DOUBLE) AS DECIMAL(28,6))) AS BIGINT))
        |           AS sa
        |  FROM gg),
        |tt AS (SELECT CAST(sum(CAST(y AS HUGEINT) * y) AS BIGINT)
        |         AS syy FROM v),
        |st AS (
        |  SELECT gt.k, gt.nn, gt.sn2,
        |         gt.sa - CAST(floor(CAST(
        |           CAST(gt.s AS DOUBLE) * CAST(gt.s AS DOUBLE)
        |           / CAST(gt.nn AS DOUBLE) AS DECIMAL(28,6)))
        |           AS BIGINT) AS ssb,
        |         tt.syy - CAST(floor(CAST(
        |           CAST(gt.s AS DOUBLE) * CAST(gt.s AS DOUBLE)
        |           / CAST(gt.nn AS DOUBLE) AS DECIMAL(28,6)))
        |           AS BIGINT) AS sst
        |  FROM gt CROSS JOIN tt)
        |SELECT CAST(k AS BIGINT) AS n_customers,
        |       CAST(nn AS BIGINT) AS n_orders,
        |       ${qm(icc, "1000000")} AS icc_micro,
        |       ${qm(n0, "1000")} AS n0_milli,
        |       ${qm(deff, "1000")} AS deff_milli
        |FROM st
        |""".stripMargin)) { (s, dir) =>
      val d38 = "decimal(38,0)"
      val v = Tables.orders(s, dir)
        .select(col("o_custkey").as("g"),
          expr("CAST(CAST(o_totalprice * 100 AS DECIMAL(38,0)) " +
            "AS BIGINT) div 100").as("y"))
        .materialize() // order fact feeds groups AND the total SS
      val gg = v.groupBy(col("g"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
      val gt = gg.agg(count(lit(1)).as("k"), sum(col("n")).as("nn"),
        sum(col("sy")).as("s"),
        sum(col("n").cast(d38) * col("n")).cast(d38).as("sn2"),
        sum(expr("CAST(floor(CAST(CAST(sy AS DOUBLE) " +
          "* CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) " +
          "AS DECIMAL(28,6))) AS BIGINT)")).as("sa"))
      val tt = v.agg(expr("CAST(sum(CAST(y AS DECIMAL(38,0)) * y) " +
        "AS BIGINT)").as("syy"))
      gt.crossJoin(broadcast(tt))
        .select(col("k"), col("nn"), col("sn2"),
          (col("sa") - expr("CAST(floor(CAST(" +
            "CAST(s AS DOUBLE) * CAST(s AS DOUBLE) " +
            "/ CAST(nn AS DOUBLE) AS DECIMAL(28,6))) AS BIGINT)"))
            .as("ssb"),
          (col("syy")
            - expr("CAST(floor(CAST(" +
              "CAST(s AS DOUBLE) * CAST(s AS DOUBLE) " +
              "/ CAST(nn AS DOUBLE) AS DECIMAL(28,6))) AS BIGINT)"))
            .as("sst"))
        .select(col("k").as("n_customers"), col("nn").as("n_orders"),
          expr(qm(icc, "1000000")).as("icc_micro"),
          expr(qm(n0, "1000")).as("n0_milli"),
          expr(qm(deff, "1000")).as("deff_milli"))
    }
  }

  /** Small-world sigma of the co-purchase graph: global clustering C
    * (3·triangles/wedges, q326's census) and characteristic path
    * length L (mean hub-BFS distance, q398's frontier rounds)
    * against the G(n,m) baselines C_r = k̄/n, L_r = ln n/ln k̄ —
    * σ = (C/C_r)/(L/L_r) > 1 reads "small world". All counts exact;
    * one fragment family for the ratios. */
  def q442: Q = {
    val nSrc = 50
    val maxD = 4
    val kbar = "(2.0 * CAST(m AS DOUBLE) / CAST(n AS DOUBLE))"
    val cObs = "(3.0 * CAST(tri AS DOUBLE) / CAST(wedges AS DOUBLE))"
    val cRand = s"($kbar / CAST(n AS DOUBLE))"
    val lObs = "(CAST(sd AS DOUBLE) / CAST(cnt AS DOUBLE))"
    val lRand = s"(ln(CAST(n AS DOUBLE)) / ln($kbar))"
    val sigma = s"(($cObs / $cRand) / ($lObs / $lRand))"
    def qm(x: String, scale: String) =
      s"CAST(floor(CAST(($x) * $scale AS DECIMAL(28,6))) AS BIGINT)"
    Q("q442_small_world_sigma",
      Some(s"""
        |WITH RECURSIVE ${SeriesQueries.sqlCopurchaseEdgeCtes},
        |e2 AS (SELECT pa AS a, pb AS b FROM e
        |       UNION ALL SELECT pb, pa FROM e),
        |deg AS (SELECT a, count(*) AS dg FROM e2 GROUP BY 1),
        |gs AS (SELECT count(*) AS n, CAST(sum(dg) AS BIGINT) // 2 AS m,
        |              CAST(sum(dg * (dg - 1)) AS BIGINT) // 2 AS wedges
        |       FROM deg),
        |tri AS (
        |  SELECT count(*) AS tri
        |  FROM e e1 JOIN e e2x ON e1.pb = e2x.pa
        |       JOIN e e3 ON e1.pa = e3.pa AND e2x.pb = e3.pb),
        |src AS (SELECT a FROM deg ORDER BY dg DESC, a LIMIT $nSrc),
        |bfs AS (
        |  SELECT a AS s, a AS v, 0 AS d FROM src
        |  UNION
        |  SELECT bfs.s, e2.b, bfs.d + 1
        |  FROM bfs JOIN e2 ON e2.a = bfs.v
        |  WHERE bfs.d < $maxD),
        |sp AS (SELECT s, v, min(d) AS d FROM bfs WHERE s <> v
        |       GROUP BY 1, 2),
        |ls AS (SELECT CAST(sum(d) AS BIGINT) AS sd, count(*) AS cnt
        |       FROM sp)
        |SELECT CAST(gs.n AS BIGINT) AS n_nodes,
        |       CAST(gs.m AS BIGINT) AS n_edges,
        |       CAST(tri.tri AS BIGINT) AS n_triangles,
        |       ${qm(cObs, "1000000")} AS c_micro,
        |       ${qm(lObs, "1000")} AS l_milli,
        |       ${qm(sigma, "1000")} AS sigma_milli
        |FROM gs CROSS JOIN tri CROSS JOIN ls
        |""".stripMargin)) { (s, dir) =>
      val e = SeriesQueries.copurchaseEdges(s, dir)
      val e2 = e.select(col("pa").as("a"), col("pb").as("b"))
        .unionAll(e.select(col("pb").as("a"), col("pa").as("b")))
        .materialize()
      val deg = e2.groupBy(col("a")).agg(count(lit(1)).as("dg"))
        .materialize()
      val gs = deg.agg(count(lit(1)).as("n"),
        expr("CAST(sum(dg) AS BIGINT) div 2").as("m"),
        expr("CAST(sum(dg * (dg - 1)) AS BIGINT) div 2").as("wedges"))
      val tri = e.select(col("pa").as("a1"), col("pb").as("b1"))
        .join(broadcast(e.select(col("pa").as("a2"), col("pb").as("b2"))),
          col("b1") === col("a2"))
        .join(broadcast(e.select(col("pa").as("a3"), col("pb").as("b3"))),
          col("a1") === col("a3") && col("b2") === col("b3"))
        .agg(count(lit(1)).as("tri"))
      val src = deg.orderBy(col("dg").desc, col("a")).limit(nSrc)
        .select(col("a").as("src"))
      // the shared size-gated BFS (min-distance is execution-shape
      // independent, so rows match the former inline per-round loop)
      val dist = SeriesQueries.bfsOnCopurchase(e2, src, maxD)
      val ls = dist.where(col("s") =!= col("v"))
        .agg(sum(col("d")).as("sd"), count(lit(1)).as("cnt"))
      gs.crossJoin(broadcast(tri)).crossJoin(broadcast(ls))
        .select(col("n").as("n_nodes"), col("m").as("n_edges"),
          col("tri").as("n_triangles"),
          expr(qm(cObs, "1000000")).as("c_micro"),
          expr(qm(lObs, "1000")).as("l_milli"),
          expr(qm(sigma, "1000")).as("sigma_milli"))
    }
  }

  /** Granger-lite causality: does Brand#1's monthly unit price help
    * predict Brand#2's monthly quantity beyond its own AR(1) past?
    * Restricted R² = corr(y_t, y_{t−1})², full R² from q417's
    * two-regressor closed form, F = (R²f − R²r)·(n−3)/(1 − R²f).
    * Month-dim value joins, exact integer moments, shared
    * fragments. */
  def q443: Q = {
    def corr(sxy: String, sx: String, sy: String, sxx: String,
        syy: String) =
      s"((CAST(n AS DOUBLE) * CAST($sxy AS DOUBLE)" +
        s" - CAST($sx AS DOUBLE) * CAST($sy AS DOUBLE))" +
        s" / sqrt((CAST(n AS DOUBLE) * CAST($sxx AS DOUBLE)" +
        s" - CAST($sx AS DOUBLE) * CAST($sx AS DOUBLE))" +
        s" * (CAST(n AS DOUBLE) * CAST($syy AS DOUBLE)" +
        s" - CAST($sy AS DOUBLE) * CAST($sy AS DOUBLE))))"
    val r2f = "CASE WHEN 1.0 - r12 * r12 <> 0.0 THEN" +
      " (r1 * r1 + r2 * r2 - 2.0 * r1 * r2 * r12)" +
      " / (1.0 - r12 * r12) END"
    val f = "CASE WHEN rf < 1.0 THEN" +
      " ((rf - rr) * (CAST(n AS DOUBLE) - 3.0)) / (1.0 - rf) END"
    def qm(x: String, scale: String) =
      s"CAST(floor(CAST(($x) * $scale AS DECIMAL(28,6))) AS BIGINT)"
    Q("q443_granger_price_to_demand",
      Some(s"""
        |WITH bm AS (
        |  SELECT p.p_brand AS b,
        |         CAST(year(l.l_shipdate) * 12 + month(l.l_shipdate)
        |              AS BIGINT) AS ym,
        |         sum(CAST(floor(CAST(l.l_extendedprice
        |              * (1.0 - l.l_discount) AS DECIMAL(18,9)) * 100)
        |              AS BIGINT)) AS net,
        |         sum(CAST(l.l_quantity AS BIGINT)) AS qty
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |  WHERE p.p_brand IN ('Brand#1', 'Brand#2')
        |  GROUP BY 1, 2),
        |xs AS (SELECT ym, (1000 * net) // qty AS x FROM bm
        |       WHERE b = 'Brand#1'),
        |ys AS (SELECT ym, CAST(qty AS BIGINT) AS y FROM bm
        |       WHERE b = 'Brand#2'),
        |tri AS (
        |  SELECT cur.y AS y, prev.y AS yl, xp.x AS xl
        |  FROM ys cur JOIN ys prev ON prev.ym = cur.ym - 1
        |       JOIN xs xp ON xp.ym = cur.ym - 1),
        |m AS (
        |  SELECT count(*) AS n, sum(y) AS sy, sum(yl) AS syl,
        |         sum(xl) AS sxl,
        |         sum(CAST(y AS HUGEINT) * y) AS syy,
        |         sum(CAST(yl AS HUGEINT) * yl) AS syly,
        |         sum(CAST(xl AS HUGEINT) * xl) AS sxlx,
        |         sum(CAST(y AS HUGEINT) * yl) AS syyl,
        |         sum(CAST(y AS HUGEINT) * xl) AS syxl,
        |         sum(CAST(yl AS HUGEINT) * xl) AS sylxl
        |  FROM tri),
        |r AS (
        |  SELECT n,
        |         ${corr("syyl", "sy", "syl", "syy", "syly")} AS r1,
        |         ${corr("syxl", "sy", "sxl", "syy", "sxlx")} AS r2,
        |         ${corr("sylxl", "syl", "sxl", "syly", "sxlx")} AS r12
        |  FROM m),
        |ff AS (SELECT n, r1 * r1 AS rr, $r2f AS rf FROM r)
        |SELECT CAST(n AS BIGINT) AS n_months,
        |       ${qm("rr", "1000")} AS r2_ar_milli,
        |       ${qm("rf", "1000")} AS r2_full_milli,
        |       ${qm(f, "1000")} AS f_milli
        |FROM ff
        |""".stripMargin)) { (s, dir) =>
      val d38 = "decimal(38,0)"
      val bm = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)
          .where(col("p_brand").isin("Brand#1", "Brand#2"))
          .select(col("p_partkey"), col("p_brand").as("b"))),
          col("p_partkey") === col("l_partkey"))
        .groupBy(col("b"),
          (year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
            .cast("long").as("ym"))
        .agg(sum(floor((col("l_extendedprice")
            * (lit(1.0) - col("l_discount"))).cast("decimal(18,9)")
            * 100).cast("long")).as("net"),
          sum(col("l_quantity").cast("long")).as("qty"))
        .materialize() // month dim feeds both series
      val xs = bm.where(col("b") === "Brand#1")
        .select((col("ym") + 1).as("__xm"),
          expr("(1000 * net) div qty").as("xl"))
      val ys = bm.where(col("b") === "Brand#2")
        .select(col("ym"), col("qty").as("y"))
      val tri = ys
        .join(bm.where(col("b") === "Brand#2")
          .select((col("ym") + 1).as("__ym"), col("qty").as("yl")),
          col("ym") === col("__ym"))
        .join(xs, col("ym") === col("__xm"))
        .select(col("y"), col("yl"), col("xl"))
      val m = tri.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
        sum(col("yl")).as("syl"), sum(col("xl")).as("sxl"),
        sum(col("y").cast(d38) * col("y")).cast(d38).as("syy"),
        sum(col("yl").cast(d38) * col("yl")).cast(d38).as("syly"),
        sum(col("xl").cast(d38) * col("xl")).cast(d38).as("sxlx"),
        sum(col("y").cast(d38) * col("yl")).cast(d38).as("syyl"),
        sum(col("y").cast(d38) * col("xl")).cast(d38).as("syxl"),
        sum(col("yl").cast(d38) * col("xl")).cast(d38).as("sylxl"))
      m.select(col("n"),
        expr(corr("syyl", "sy", "syl", "syy", "syly")).as("r1"),
        expr(corr("syxl", "sy", "sxl", "syy", "sxlx")).as("r2"),
        expr(corr("sylxl", "syl", "sxl", "syly", "sxlx")).as("r12"))
        .select(col("n"), (col("r1") * col("r1")).as("rr"),
          expr(r2f).as("rf"))
        .select(col("n").as("n_months"),
          expr(qm("rr", "1000")).as("r2_ar_milli"),
          expr(qm("rf", "1000")).as("r2_full_milli"),
          expr(qm(f, "1000")).as("f_milli"))
    }
  }

  /** Log-rank test between urgent and non-urgent ship lead times
    * (q357's Kaplan-Meier sibling): at each distinct lead day,
    * observed group-1 events vs the hypergeometric expectation over
    * the shrinking risk sets (risk counts from cumulative sums over
    * the bounded lead-day dim), per-day O−E and variance terms
    * micro-quantized before the sums, final z one fragment. */
  def q444: Q = {
    val oe = "CAST(floor(CAST(1000000.0 * (CAST(d1 AS DOUBLE)" +
      " - CAST(dj AS DOUBLE) * CAST(n1 AS DOUBLE)" +
      " / CAST(nj AS DOUBLE)) AS DECIMAL(28,6))) AS BIGINT)"
    val vt = "CASE WHEN nj > 1 THEN CAST(floor(CAST(1000000.0 *" +
      " (CAST(dj AS DOUBLE) * (CAST(n1 AS DOUBLE) / CAST(nj AS DOUBLE))" +
      " * (1.0 - CAST(n1 AS DOUBLE) / CAST(nj AS DOUBLE))" +
      " * (CAST(nj AS DOUBLE) - CAST(dj AS DOUBLE))" +
      " / (CAST(nj AS DOUBLE) - 1.0)) AS DECIMAL(28,6))) AS BIGINT)" +
      " ELSE 0 END"
    val z = "CASE WHEN sv > 0 THEN CAST(floor(CAST(1000.0" +
      " * (CAST(soe AS DOUBLE) / 1000000.0)" +
      " / sqrt(CAST(sv AS DOUBLE) / 1000000.0)" +
      " AS DECIMAL(28,6))) AS BIGINT) END"
    Q("q444_logrank_lead_time",
      Some(s"""
        |WITH v AS (
        |  SELECT date_diff('day', o.o_orderdate, l.l_shipdate) AS t,
        |         CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1
        |              ELSE 0 END AS g1
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
        |td AS (
        |  SELECT t, count(*) AS dj, sum(g1) AS d1 FROM v GROUP BY 1),
        |tot AS (SELECT CAST(sum(dj) AS BIGINT) AS nn,
        |               CAST(sum(d1) AS BIGINT) AS nn1 FROM td),
        |rs AS (
        |  SELECT td.t, td.dj, td.d1,
        |         tot.nn - CAST(coalesce(sum(td.dj) OVER (ORDER BY td.t
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |           0) AS BIGINT) AS nj,
        |         tot.nn1 - CAST(coalesce(sum(td.d1) OVER (ORDER BY td.t
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |           0) AS BIGINT) AS n1
        |  FROM td CROSS JOIN tot),
        |terms AS (SELECT $oe AS oe, $vt AS vt FROM rs),
        |agg AS (SELECT sum(oe) AS soe, sum(vt) AS sv FROM terms)
        |SELECT tot.nn1 AS n_urgent_lines,
        |       CAST(tot.nn - tot.nn1 AS BIGINT) AS n_other_lines,
        |       CAST(agg.soe AS BIGINT) AS oe_sum_micro,
        |       $z AS z_milli
        |FROM agg CROSS JOIN tot
        |""".stripMargin)) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val td = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority")),
          col("o_orderkey") === col("l_orderkey"))
        .select(datediff(col("l_shipdate"), col("o_orderdate"))
          .cast("long").as("t"),
          when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
            .as("g1"))
        .groupBy(col("t"))
        .agg(count(lit(1)).as("dj"), sum(col("g1")).as("d1"))
        .materialize() // lead-day dim feeds totals AND risk sets
      val tot = td.agg(sum(col("dj")).as("nn"), sum(col("d1")).as("nn1"))
      // lead-day dim is range-bounded → the risk-set window is fine
      val w = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val rs = td.crossJoin(broadcast(tot))
        .withColumn("nj", col("nn")
          - coalesce(sum(col("dj")).over(w), lit(0L)))
        .withColumn("n1", col("nn1")
          - coalesce(sum(col("d1")).over(w), lit(0L)))
      rs.select(expr(oe).as("oe"), expr(vt).as("vt"))
        .agg(sum(col("oe")).as("soe"), sum(col("vt")).as("sv"))
        .crossJoin(broadcast(tot))
        .select(col("nn1").as("n_urgent_lines"),
          (col("nn") - col("nn1")).as("n_other_lines"),
          col("soe").as("oe_sum_micro"),
          expr(z).as("z_milli"))
    }
  }

  /** Entropy rate of the per-user event-type Markov chain (q337's
    * transition counts): H = Σ_{ij} (n_ij/T)·ln(tot_i/n_ij) with
    * each of the ≤25 edge terms micro-quantized before the sum, and
    * the chain's perplexity e^H — "how predictable is the next
    * event". Exact counts; ln only inside quantized fragments. */
  def q445: Q = {
    val term = "CAST(floor(CAST(1000000000.0 * CAST(n AS DOUBLE)" +
      " / CAST(tt AS DOUBLE)" +
      " * ln(CAST(tot AS DOUBLE) / CAST(n AS DOUBLE))" +
      " AS DECIMAL(28,6))) AS BIGINT)"
    val ppx = "CAST(floor(CAST(1000.0" +
      " * exp(CAST(sh AS DOUBLE) / 1000000000.0)" +
      " AS DECIMAL(28,6))) AS BIGINT)"
    Q("q445_markov_entropy_rate",
      Some(s"""
        |WITH e AS (
        |  SELECT user_id, event_type, epoch_ns(ts) AS ns, event_id
        |  FROM events),
        |tr AS (
        |  SELECT event_type AS a,
        |         lead(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ns, event_id) AS b
        |  FROM e),
        |c AS (SELECT a, b, count(*) AS n FROM tr
        |      WHERE b IS NOT NULL GROUP BY 1, 2),
        |ot AS (SELECT a, CAST(sum(n) AS BIGINT) AS tot FROM c
        |       GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tt,
        |             count(DISTINCT a) AS k FROM c),
        |terms AS (
        |  SELECT $term AS tm
        |  FROM c JOIN ot USING (a) CROSS JOIN t),
        |agg AS (SELECT sum(tm) AS sh FROM terms)
        |SELECT CAST(t.tt AS BIGINT) AS n_transitions,
        |       CAST(t.k AS BIGINT) AS k_states,
        |       CAST(agg.sh AS BIGINT) AS entropy_nano,
        |       $ppx AS perplexity_milli
        |FROM agg CROSS JOIN t
        |""".stripMargin)) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val tr = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"),
          col("event_id"))
        .withColumn("b", lead(col("event_type"), 1).over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("ts"), col("event_id"))))
        .where(col("b").isNotNull)
        .select(col("event_type").as("a"), col("b"))
      val c = tr.groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("n"))
        .materialize() // 25-edge dim feeds margins and terms
      val ot = c.groupBy(col("a").as("__oa"))
        .agg(sum(col("n")).as("tot"))
      val t = c.agg(sum(col("n")).as("tt"),
        countDistinct(col("a")).as("k"))
      c.join(broadcast(ot), col("a") === col("__oa"))
        .crossJoin(broadcast(t))
        .select(expr(term).as("tm"))
        .agg(sum(col("tm")).as("sh"))
        .crossJoin(broadcast(t))
        .select(col("tt").as("n_transitions"), col("k").as("k_states"),
          col("sh").as("entropy_nano"),
          expr(ppx).as("perplexity_milli"))
    }
  }

  /** CUPED variance reduction for an A/B readout: per-customer
    * pre-period spend X (orders before 1998-05-01, the range
    * midpoint) as the covariate for post-period spend Y, θ =
    * cov(X,Y)/var(X) from exact integer moments, variance-reduction
    * share = corr², and the custkey-parity arm diff both raw and
    * CUPED-adjusted (the θ·(X̄₁−X̄₀) correction). One moments pass;
    * every ratio a shared fragment over exact integers. */
  def q446: Q = {
    val cut = "TIMESTAMP '1998-05-01 00:00:00'"
    val cxy = "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)" +
      " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    val vx = "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)" +
      " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    val vy = "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)" +
      " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
    val theta = s"($cxy / $vx)"
    val corr2 = s"(($cxy * $cxy) / ($vx * $vy))"
    val diffRaw = "(CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)" +
      " - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE))"
    val diffX = "(CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)" +
      " - CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE))"
    val diffCuped = s"($diffRaw - $theta * $diffX)"
    def qm(x: String, scale: String) =
      s"CAST(floor(CAST(($x) * $scale AS DECIMAL(28,6))) AS BIGINT)"
    Q("q446_cuped_variance_reduction",
      Some(s"""
        |WITH o AS (
        |  SELECT o_custkey AS c,
        |         CASE WHEN o_orderdate < $cut
        |              THEN CAST(o_totalprice * 100 AS BIGINT)
        |              ELSE 0 END AS xc,
        |         CASE WHEN o_orderdate >= $cut
        |              THEN CAST(o_totalprice * 100 AS BIGINT)
        |              ELSE 0 END AS yc
        |  FROM orders),
        |cust AS (
        |  SELECT c, CAST(sum(xc) AS BIGINT) AS x,
        |         CAST(sum(yc) AS BIGINT) AS y, c % 2 AS a
        |  FROM o GROUP BY 1),
        |m AS (
        |  SELECT count(*) AS n,
        |         CAST(sum(x) AS BIGINT) AS sx,
        |         CAST(sum(y) AS BIGINT) AS sy,
        |         sum(CAST(x AS HUGEINT) * x) AS sxx,
        |         sum(CAST(x AS HUGEINT) * y) AS sxy,
        |         sum(CAST(y AS HUGEINT) * y) AS syy,
        |         CAST(sum(CASE WHEN a = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n1,
        |         CAST(sum(CASE WHEN a = 1 THEN x ELSE 0 END) AS BIGINT)
        |           AS sx1,
        |         CAST(sum(CASE WHEN a = 1 THEN y ELSE 0 END) AS BIGINT)
        |           AS sy1,
        |         CAST(sum(CASE WHEN a = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n0,
        |         CAST(sum(CASE WHEN a = 0 THEN x ELSE 0 END) AS BIGINT)
        |           AS sx0,
        |         CAST(sum(CASE WHEN a = 0 THEN y ELSE 0 END) AS BIGINT)
        |           AS sy0
        |  FROM cust)
        |SELECT CAST(n AS BIGINT) AS n_customers,
        |       ${qm(theta, "1000000")} AS theta_micro,
        |       ${qm(corr2, "1000")} AS var_reduction_milli,
        |       ${qm(diffRaw, "1000")} AS diff_raw_millicents,
        |       ${qm(diffCuped, "1000")} AS diff_cuped_millicents
        |FROM m
        |""".stripMargin)) { (s, dir) =>
      val d38 = "decimal(38,0)"
      val cents = "CAST(CAST(o_totalprice * 100 AS DECIMAL(38,0))" +
        " AS BIGINT)"
      val cust = Tables.orders(s, dir)
        .select(col("o_custkey").as("c"),
          expr(s"CASE WHEN o_orderdate < $cut THEN $cents" +
            " ELSE CAST(0 AS BIGINT) END").as("xc"),
          expr(s"CASE WHEN o_orderdate >= $cut THEN $cents" +
            " ELSE CAST(0 AS BIGINT) END").as("yc"))
        .groupBy(col("c"))
        .agg(sum(col("xc")).as("x"), sum(col("yc")).as("y"))
        .withColumn("a", col("c") % 2)
      cust.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x").cast(d38) * col("x")).cast(d38).as("sxx"),
        sum(col("x").cast(d38) * col("y")).cast(d38).as("sxy"),
        sum(col("y").cast(d38) * col("y")).cast(d38).as("syy"),
        sum(when(col("a") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("a") === 1, col("x")).otherwise(0L)).as("sx1"),
        sum(when(col("a") === 1, col("y")).otherwise(0L)).as("sy1"),
        sum(when(col("a") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("a") === 0, col("x")).otherwise(0L)).as("sx0"),
        sum(when(col("a") === 0, col("y")).otherwise(0L)).as("sy0"))
        .select(col("n").as("n_customers"),
          expr(qm(theta, "1000000")).as("theta_micro"),
          expr(qm(corr2, "1000")).as("var_reduction_milli"),
          expr(qm(diffRaw, "1000")).as("diff_raw_millicents"),
          expr(qm(diffCuped, "1000")).as("diff_cuped_millicents"))
    }
  }

  /** James-Stein shrinkage of per-brand return rates toward the
    * grand mean: positive-part factor c = (1 − (k−3)·v̄/S)₊ with S
    * the between-brand squared deviation (pico-quantized per-brand
    * terms, exact sum) and v̄ the mean binomial variance at the
    * pooled rate. The brand dim (25 rows) broadcasts; rates are
    * nano-quantized integer divisions so both engines shrink the
    * same numbers. */
  def q447: Q = {
    val dev = "((CAST(r AS DOUBLE) - CAST(sr AS DOUBLE)" +
      " / CAST(kk AS DOUBLE)) / 1000000000.0)"
    val tq = s"CAST(floor(CAST($dev * $dev * 1000000000000.0" +
      " AS DECIMAL(28,6))) AS BIGINT)"
    val pb = "(CAST(tret AS DOUBLE) / CAST(tn AS DOUBLE))"
    val uq = s"CAST(floor(CAST(1000000000000000.0 * $pb * (1.0 - $pb)" +
      " / CAST(nl AS DOUBLE) AS DECIMAL(28,6))) AS BIGINT)"
    val cf = "CASE WHEN spico > 0 THEN greatest(0.0," +
      " 1.0 - (CAST(kk AS DOUBLE) - 3.0)" +
      " * (CAST(sv AS DOUBLE) / CAST(kk AS DOUBLE)" +
      " / 1000000000000000.0)" +
      " / (CAST(spico AS DOUBLE) / 1000000000000.0)) ELSE 0.0 END"
    val shr = s"(CAST(sr AS DOUBLE) / CAST(kk AS DOUBLE)" +
      s" / 1000000000.0 + $cf * $dev)"
    def qm(x: String, scale: String) =
      s"CAST(floor(CAST(($x) * $scale AS DECIMAL(28,6))) AS BIGINT)"
    Q("q447_james_stein_brand_rates",
      Some(s"""
        |WITH b AS (
        |  SELECT p.p_brand AS brand, count(*) AS nl,
        |         CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1
        |                  ELSE 0 END) AS BIGINT) AS ret
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |  GROUP BY 1),
        |r0 AS (
        |  SELECT brand, nl, ret,
        |         (CAST(1000000000 AS BIGINT) * ret) // nl AS r
        |  FROM b),
        |g AS (
        |  SELECT count(*) AS kk, CAST(sum(r) AS BIGINT) AS sr,
        |         CAST(sum(ret) AS BIGINT) AS tret,
        |         CAST(sum(nl) AS BIGINT) AS tn
        |  FROM r0),
        |terms AS (
        |  SELECT $tq AS t, $uq AS u
        |  FROM r0 CROSS JOIN g),
        |sg AS (
        |  SELECT CAST(sum(t) AS BIGINT) AS spico,
        |         CAST(sum(u) AS BIGINT) AS sv
        |  FROM terms)
        |SELECT brand, CAST(nl AS BIGINT) AS n_lines,
        |       CAST(r AS BIGINT) AS rate_nano,
        |       ${qm(cf, "1000")} AS js_factor_milli,
        |       ${qm(shr, "1000000000")} AS shrunk_nano
        |FROM r0 CROSS JOIN g CROSS JOIN sg
        |ORDER BY brand
        |""".stripMargin)) { (s, dir) =>
      val b = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)
          .select(col("p_partkey"), col("p_brand").as("brand"))),
          col("p_partkey") === col("l_partkey"))
        .groupBy(col("brand"))
        .agg(count(lit(1)).as("nl"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .as("ret"))
        .withColumn("r",
          expr("(CAST(1000000000 AS BIGINT) * ret) div nl"))
        .materialize() // 25-brand dim feeds scalars AND output rows
      val g = b.agg(count(lit(1)).as("kk"), sum(col("r")).as("sr"),
        sum(col("ret")).as("tret"), sum(col("nl")).as("tn"))
      val sg = b.crossJoin(broadcast(g))
        .select(expr(tq).as("t"), expr(uq).as("u"))
        .agg(sum(col("t")).as("spico"), sum(col("u")).as("sv"))
      b.crossJoin(broadcast(g)).crossJoin(broadcast(sg))
        .select(col("brand"), col("nl").as("n_lines"),
          col("r").as("rate_nano"),
          expr(qm(cf, "1000")).as("js_factor_milli"),
          expr(qm(shr, "1000000000")).as("shrunk_nano"))
        .orderBy(col("brand"))
    }
  }

  /** Two-proportion z-test + detectable effect: urgent vs non-urgent
    * orders' finished-status rates, pooled-variance z, and the
    * 80%-power minimum detectable effect (z_{α/2}+z_β = 2.801585
    * standard errors) — "is the observed gap real, and what gap
    * could this sample even see". One aggregation pass; four
    * integers feed every fragment. */
  def q448: Q = {
    val p1 = "(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))"
    val p0 = "(CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))"
    val pbar = "((CAST(s1 AS DOUBLE) + CAST(s0 AS DOUBLE))" +
      " / (CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE)))"
    val se = s"sqrt($pbar * (1.0 - $pbar)" +
      " * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n0 AS DOUBLE)))"
    val z = s"(($p1 - $p0) / $se)"
    val mde = s"(2.801585 * $se)"
    def qm(x: String, scale: String) =
      s"CAST(floor(CAST(($x) * $scale AS DECIMAL(28,6))) AS BIGINT)"
    Q("q448_urgent_ztest_mde",
      Some(s"""
        |WITH m AS (
        |  SELECT
        |    CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1
        |             ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
        |             AND o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |         AS BIGINT) AS s1,
        |    CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT' THEN 1
        |             ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT'
        |             AND o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |         AS BIGINT) AS s0
        |  FROM orders)
        |SELECT n1 AS n_urgent, n0 AS n_other,
        |       ${qm(p1, "1000000")} AS p_urgent_micro,
        |       ${qm(p0, "1000000")} AS p_other_micro,
        |       ${qm(z, "1000")} AS z_milli,
        |       ${qm(mde, "1000000")} AS mde80_micro
        |FROM m
        |""".stripMargin)) { (s, dir) =>
      Tables.orders(s, dir)
        .agg(
          sum(when(col("o_orderpriority") === "1-URGENT", 1L)
            .otherwise(0L)).as("n1"),
          sum(when(col("o_orderpriority") === "1-URGENT"
            && col("o_orderstatus") === "F", 1L).otherwise(0L)).as("s1"),
          sum(when(col("o_orderpriority") =!= "1-URGENT", 1L)
            .otherwise(0L)).as("n0"),
          sum(when(col("o_orderpriority") =!= "1-URGENT"
            && col("o_orderstatus") === "F", 1L).otherwise(0L)).as("s0"))
        .select(col("n1").as("n_urgent"), col("n0").as("n_other"),
          expr(qm(p1, "1000000")).as("p_urgent_micro"),
          expr(qm(p0, "1000000")).as("p_other_micro"),
          expr(qm(z, "1000")).as("z_milli"),
          expr(qm(mde, "1000000")).as("mde80_micro"))
    }
  }

  /** Beta-Binomial posterior for per-segment customer activation:
    * uniform Beta(1,1) prior, s = customers with ≥1 order, posterior
    * mean (s+1)/(n+2) and a normal-approx 95% credible interval from
    * the exact Beta variance αβ/((α+β)²(α+β+1)). Segment dim is 5
    * rows; the activation flag comes from a distinct-custkey
    * semi-join. */
  def q449: Q = {
    val al = "(CAST(sa AS DOUBLE) + 1.0)"
    val be = "(CAST(n AS DOUBLE) - CAST(sa AS DOUBLE) + 1.0)"
    val mean = s"($al / ($al + $be))"
    val sd = s"sqrt($al * $be / (($al + $be) * ($al + $be)" +
      s" * ($al + $be + 1.0)))"
    val lo = s"($mean - 1.959964 * $sd)"
    val hi = s"($mean + 1.959964 * $sd)"
    def qm(x: String, scale: String) =
      s"CAST(floor(CAST(($x) * $scale AS DECIMAL(28,6))) AS BIGINT)"
    Q("q449_segment_beta_posterior",
      Some(s"""
        |WITH act AS (SELECT DISTINCT o_custkey AS c FROM orders),
        |g AS (
        |  SELECT cu.c_mktsegment AS segment, count(*) AS n,
        |         CAST(sum(CASE WHEN act.c IS NOT NULL THEN 1 ELSE 0
        |                  END) AS BIGINT) AS sa
        |  FROM customer cu LEFT JOIN act ON act.c = cu.c_custkey
        |  GROUP BY 1)
        |SELECT segment, CAST(n AS BIGINT) AS n_customers,
        |       sa AS n_active,
        |       ${qm(mean, "1000000")} AS mean_micro,
        |       ${qm(lo, "1000000")} AS lo_micro,
        |       ${qm(hi, "1000000")} AS hi_micro
        |FROM g ORDER BY segment
        |""".stripMargin)) { (s, dir) =>
      val act = Tables.orders(s, dir)
        .select(col("o_custkey").as("c")).distinct()
      Tables.customer(s, dir)
        .join(broadcast(act), col("c") === col("c_custkey"), "left")
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("c").isNotNull, 1L).otherwise(0L)).as("sa"))
        .select(col("segment"), col("n").as("n_customers"),
          col("sa").as("n_active"),
          expr(qm(mean, "1000000")).as("mean_micro"),
          expr(qm(lo, "1000000")).as("lo_micro"),
          expr(qm(hi, "1000000")).as("hi_micro"))
        .orderBy(col("segment"))
    }
  }

  /** Average precision (PR-AUC) of the q170 quality score against
    * the English label: rank by (score desc, doc_id) through the
    * bucket-parallel globalRankCum (score-octave buckets — no
    * single-partition fact window), precision@k terms nano-quantized
    * at each positive, AP = Σ(prec@k)/R. The PR sibling of q170's
    * rank-based AUC. */
  def q450: Q = {
    val sw = sqlInList(TextAnalysis.LangStopwords.head._2)
    def term(c: String, k: String) =
      s"CAST(floor(CAST(1000000000.0 * CAST($c AS DOUBLE)" +
        s" / CAST($k AS DOUBLE) AS DECIMAL(28,6))) AS BIGINT)"
    def ap(st: String, r: String) =
      s"CAST(floor(CAST(1000000.0 * (CAST($st AS DOUBLE)" +
        s" / 1000000000.0) / CAST($r AS DOUBLE) AS DECIMAL(28,6)))" +
        " AS BIGINT)"
    Q("q450_average_precision",
      Some(s"""
        |WITH t0 AS (
        |  SELECT doc_id, lang, text, ${sqlTokens("text")} AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |t AS (
        |  SELECT doc_id,
        |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
        |         CAST(CAST(${sqlQualityExpr(sw)} AS DECIMAL(18,9))
        |              * 1000000000 AS BIGINT) AS sc
        |  FROM t0 WHERE len(toks) > 0),
        |rk AS (
        |  SELECT y,
        |         row_number() OVER (ORDER BY sc DESC, doc_id) AS k,
        |         CAST(sum(y) OVER (ORDER BY sc DESC, doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS c
        |  FROM t),
        |st AS (
        |  SELECT CAST(sum(${term("c", "k")}) AS BIGINT) AS sterms
        |  FROM rk WHERE y = 1),
        |tot AS (SELECT CAST(sum(y) AS BIGINT) AS r,
        |               count(*) AS nd FROM t)
        |SELECT CAST(tot.nd AS BIGINT) AS n_docs, tot.r AS n_pos,
        |       st.sterms AS sum_prec_nano,
        |       ${ap("st.sterms", "tot.r")} AS ap_micro
        |FROM st CROSS JOIN tot
        |""".stripMargin)) { (s, dir) =>
      import org.apache.spark.sql.types.DecimalType
      val sw0 = TextAnalysis.LangStopwords.head._2
      val base = Tables.documents(s, dir)
        .where(col("text").isNotNull &&
          TextAnalysis.tokenCount(col("text")) > 0)
        .select(col("doc_id"),
          when(col("lang") === "en", 1L).otherwise(0L).as("y"),
          (TextAnalysis.qualityScore(col("text"), sw0)
            .cast(DecimalType(18, 9)) * lit(1000000000L)).cast("long")
            .as("sc"))
        .withColumn("neg", -col("sc"))
        .withColumn("__bkt", expr("neg div 16777216"))
        .materialize() // scored docs feed totals AND the rank pass
      val tot = base.agg(sum(col("y")).as("r"), count(lit(1)).as("nd"))
      val ranked = graft.dedup.SortedNeighborhood.globalRankCum(
        base, idCol = "doc_id", bucketCol = "__bkt",
        tieCols = Seq("neg"), cumCol = Some("y"))
      ranked.where(col("y") === 1)
        .select(expr(term("__cum", "__rank")).as("tm"))
        .agg(sum(col("tm")).as("sterms"))
        .crossJoin(broadcast(tot))
        .select(col("nd").as("n_docs"), col("r").as("n_pos"),
          col("sterms").as("sum_prec_nano"),
          expr(ap("sterms", "r")).as("ap_micro"))
    }
  }
}
