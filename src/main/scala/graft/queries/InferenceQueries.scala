package graft.queries

import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-7 resampling-and-inference wave: deterministic-LCG bootstrap
  * confidence intervals, closed-form jackknife standard errors,
  * capture-recapture population estimation, hypergeometric enrichment
  * z-scores, and an SPT scheduling what-if — the uncertainty-
  * quantification faces, every random draw replaced by the q31 LCG
  * so both engines replay identical "randomness". */
object InferenceQueries {

  val all: Seq[Q] = Seq(q436, q437, q438, q439, q440)

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
}
