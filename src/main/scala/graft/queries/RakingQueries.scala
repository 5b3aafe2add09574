package graft.queries

import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-7 raking wave: price-leadership lead-lag voting, iterative
  * proportional fitting (raking) on scaled integers, weight-of-
  * evidence / information value, the sample-size planning curve, and
  * geometric-Brownian calibration of daily revenue. IPF follows the
  * PageRank discipline — integer state per round, MATERIALIZED
  * generated CTEs in the oracle. */
object RakingQueries {

  val all: Seq[Q] = Seq(q566, q567, q568, q569, q570)

  /** Price leadership: for the five biggest brands, does this brand's
    * monthly unit-price move precede the rest-of-market's move
    * (sign(Δp_brand,t) = sign(Δp_market,t+1)) more often than it
    * follows? Lead/follow vote counts from exact sign comparisons —
    * the tacit-coordination screen. */
  def q566: Q = Q(
    "q566_price_leadership",
    Some("""
      |WITH bm AS (
      |  SELECT p.p_brand AS br,
      |         year(l.l_shipdate) * 12 + month(l.l_shipdate) AS mo,
      |         CAST(sum(CAST(l.l_extendedprice * 100 AS HUGEINT))
      |              AS BIGINT) AS e,
      |         sum(CAST(floor(l.l_quantity + 0.5) AS BIGINT)) AS q
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  GROUP BY 1, 2),
      |top5 AS (
      |  SELECT br FROM (SELECT br, sum(e) AS s FROM bm GROUP BY 1
      |                  ORDER BY s DESC, br LIMIT 5) t),
      |mk AS (SELECT mo, sum(e) AS e, sum(q) AS q FROM bm GROUP BY 1),
      |bd AS (
      |  SELECT a.br, a.mo,
      |         CASE WHEN CAST(b.e AS HUGEINT) * a.q
      |                 > CAST(a.e AS HUGEINT) * b.q THEN 1
      |              WHEN CAST(b.e AS HUGEINT) * a.q
      |                 < CAST(a.e AS HUGEINT) * b.q THEN -1
      |              ELSE 0 END AS s
      |  FROM bm a JOIN bm b ON a.br = b.br AND b.mo = a.mo + 1
      |  WHERE a.q > 0 AND b.q > 0
      |    AND a.br IN (SELECT br FROM top5)),
      |md AS (
      |  SELECT a.mo,
      |         CASE WHEN CAST(b.e AS HUGEINT) * a.q
      |                 > CAST(a.e AS HUGEINT) * b.q THEN 1
      |              WHEN CAST(b.e AS HUGEINT) * a.q
      |                 < CAST(a.e AS HUGEINT) * b.q THEN -1
      |              ELSE 0 END AS s
      |  FROM mk a JOIN mk b ON b.mo = a.mo + 1
      |  WHERE a.q > 0 AND b.q > 0),
      |votes AS (
      |  SELECT bd.br,
      |         sum(CASE WHEN bd.s != 0 AND bd.s = ml.s THEN 1 ELSE 0 END)
      |           AS leads,
      |         sum(CASE WHEN bd.s != 0 AND bd.s = mf.s THEN 1 ELSE 0 END)
      |           AS follows
      |  FROM bd
      |  LEFT JOIN md ml ON ml.mo = bd.mo + 1
      |  LEFT JOIN md mf ON mf.mo = bd.mo - 1
      |  GROUP BY 1)
      |SELECT br AS brand, CAST(leads AS BIGINT) AS leads,
      |       CAST(follows AS BIGINT) AS follows,
      |       CAST(CASE WHEN follows = 0 THEN 0
      |            ELSE (1000 * leads) // follows END AS BIGINT)
      |         AS lead_follow_milli
      |FROM votes ORDER BY brand
      |""".stripMargin)) { (s, dir) =>
    val bm = Tables.lineitem(s, dir)
      .join(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand").as("br")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("br"),
        (year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
          .as("mo"))
      .agg(expr("CAST(sum(CAST(l_extendedprice * 100 AS DECIMAL(38,0)))" +
        " AS BIGINT)").as("e"),
        sum(expr("CAST(floor(l_quantity + 0.5) AS BIGINT)")).as("q"))
      .materialize()
    val top5 = bm.groupBy(col("br")).agg(sum(col("e")).as("s"))
      .orderBy(col("s").desc, col("br")).limit(5).select(col("br"))
    val mk = bm.groupBy(col("mo"))
      .agg(sum(col("e")).as("e"), sum(col("q")).as("q"))
      .materialize()
    def signDiff(df: org.apache.spark.sql.DataFrame, keyCols: Seq[String]) = {
      val b = df.select((keyCols.map(k => col(k).as(s"b_$k"))
        :+ col("mo").as("b_mo") :+ col("e").as("b_e")
        :+ col("q").as("b_q")): _*)
      val cond = keyCols.map(k => col(k) === col(s"b_$k"))
        .foldLeft(col("b_mo") === col("mo") + 1)(_ && _)
      df.join(b, cond)
        .where(col("q") > 0 && col("b_q") > 0)
        .select((keyCols.map(col) :+ col("mo") :+
          when(col("b_e").cast("decimal(38,0)") * col("q")
            > col("e").cast("decimal(38,0)") * col("b_q"), 1)
            .when(col("b_e").cast("decimal(38,0)") * col("q")
              < col("e").cast("decimal(38,0)") * col("b_q"), -1)
            .otherwise(0).as("s")): _*)
    }
    val bd = signDiff(bm, Seq("br"))
      .join(broadcast(top5.withColumnRenamed("br", "tbr")),
        col("br") === col("tbr"), "left_semi")
    val md = signDiff(mk, Seq.empty)
      .select(col("mo").as("mmo"), col("s").as("ms"))
      .materialize() // month dim
    bd.join(broadcast(md.select((col("mmo") - 1).as("lmo"),
        col("ms").as("ls"))), col("lmo") === col("mo"), "left")
      .join(broadcast(md.select((col("mmo") + 1).as("fmo"),
        col("ms").as("fs"))), col("fmo") === col("mo"), "left")
      .groupBy(col("br"))
      .agg(sum(when(col("s") =!= 0 && col("s") === col("ls"), 1L)
        .otherwise(0L)).as("leads"),
        sum(when(col("s") =!= 0 && col("s") === col("fs"), 1L)
          .otherwise(0L)).as("follows"))
      .select(col("br").as("brand"), col("leads"), col("follows"),
        expr("CASE WHEN follows = 0 THEN 0" +
          " ELSE (1000 * leads) div follows END").as("lead_follow_milli"))
      .orderBy(col("brand"))
  }

  /** Iterative proportional fitting (raking) of the brand × discount
    * count table to UNIFORM target margins — 8 alternating row/column
    * scaling rounds on micro-scaled integers (survey statistics'
    * workhorse; also the Sinkhorn iteration), every round quantized so
    * the whole trajectory hash-replays. Outputs the final margin
    * residual and the most-adjusted cell. */
  def q567: Q = {
    val iters = 4 // row+col pairs
    val duckRounds = (1 to iters).map { k =>
      s"""rs$k AS MATERIALIZED (
         |  SELECT br, sum(w) AS rw FROM t${k - 1} GROUP BY 1),
         |tr$k AS MATERIALIZED (
         |  SELECT t.br, t.dc,
         |         (t.w * (SELECT tot // nbr FROM sc)) // rs$k.rw AS w
         |  FROM t${k - 1} t JOIN rs$k ON rs$k.br = t.br),
         |cs$k AS MATERIALIZED (
         |  SELECT dc, sum(w) AS cw FROM tr$k GROUP BY 1),
         |t$k AS MATERIALIZED (
         |  SELECT t.br, t.dc,
         |         (t.w * (SELECT tot // ndc FROM sc)) // cs$k.cw AS w
         |  FROM tr$k t JOIN cs$k ON cs$k.dc = t.dc)""".stripMargin
    }.mkString(",\n")
    Q("q567_ipf_raking",
      Some(s"""
        |WITH cell AS (
        |  SELECT p.p_brand AS br,
        |         CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT) AS dc,
        |         count(*) AS n
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2),
        |sc AS MATERIALIZED (
        |  SELECT sum(n) * 1000 AS tot, count(DISTINCT br) AS nbr,
        |         count(DISTINCT dc) AS ndc
        |  FROM cell),
        |t0 AS MATERIALIZED (SELECT br, dc, n * 1000 AS w FROM cell),
        |$duckRounds,
        |res AS (
        |  SELECT max(abs(rw - (SELECT tot // nbr FROM sc))) AS r
        |  FROM (SELECT br, sum(w) AS rw FROM t$iters GROUP BY 1) m),
        |mx AS (
        |  SELECT cell.br, cell.dc,
        |         (1000 * t$iters.w) // (cell.n * 1000) AS ratio_milli
        |  FROM t$iters JOIN cell ON cell.br = t$iters.br
        |       AND cell.dc = t$iters.dc
        |  ORDER BY ratio_milli DESC, cell.br, cell.dc LIMIT 1)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM cell) AS n_cells,
        |       (SELECT CAST(r AS BIGINT) FROM res)
        |         AS margin_residual_milli,
        |       (SELECT br FROM mx) AS most_raised_brand,
        |       (SELECT CAST(dc AS BIGINT) FROM mx)
        |         AS most_raised_discount,
        |       (SELECT CAST(ratio_milli AS BIGINT) FROM mx)
        |         AS max_ratio_milli
        |""".stripMargin)) { (s, dir) =>
      val cell = Tables.lineitem(s, dir)
        .join(Tables.part(s, dir)
          .select(col("p_partkey"), col("p_brand").as("br")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("br"),
          expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)").as("dc"))
        .agg(count(lit(1)).as("n"))
        .materialize() // 275-cell dim
      val sc = cell.agg((sum(col("n")) * 1000).as("tot"),
          countDistinct(col("br")).as("nbr"),
          countDistinct(col("dc")).as("ndc"))
        .select(expr("tot div nbr").as("rowT"),
          expr("tot div ndc").as("colT"))
        .materialize()
      var t = cell.select(col("br"), col("dc"), (col("n") * 1000).as("w"))
        .materialize()
      for (_ <- 1 to iters) {
        val rs = t.groupBy(col("br").as("rbr"))
          .agg(sum(col("w")).as("rw"))
        val tr = t.join(broadcast(rs), col("rbr") === col("br"))
          .crossJoin(broadcast(sc))
          .select(col("br"), col("dc"),
            expr("(w * rowT) div rw").as("w"))
        val cs = tr.groupBy(col("dc").as("cdc"))
          .agg(sum(col("w")).as("cw"))
        t = tr.join(broadcast(cs), col("cdc") === col("dc"))
          .crossJoin(broadcast(sc))
          .select(col("br"), col("dc"),
            expr("(w * colT) div cw").as("w"))
          .materialize(truncate = true) // constant-depth per round
      }
      val res = t.groupBy(col("br")).agg(sum(col("w")).as("rw"))
        .crossJoin(broadcast(sc))
        .agg(max(abs(col("rw") - col("rowT"))).as("margin_residual_milli"))
      val mx = t.join(cell.select(col("br").as("cbr"),
          col("dc").as("cdc2"), col("n")),
          col("cbr") === col("br") && col("cdc2") === col("dc"))
        .select(col("br"), col("dc"),
          expr("(1000 * w) div (n * 1000)").as("ratio_milli"))
        .orderBy(col("ratio_milli").desc, col("br"), col("dc"))
        .limit(1)
      val nc = cell.agg(count(lit(1)).as("n_cells"))
      nc.crossJoin(broadcast(res)).crossJoin(broadcast(mx))
        .select(col("n_cells"), col("margin_residual_milli"),
          col("br").as("most_raised_brand"),
          col("dc").as("most_raised_discount"),
          col("ratio_milli").as("max_ratio_milli"))
    }
  }

  /** Weight of evidence and information value of the discount level
    * against returns — the credit-scoring feature-strength standard
    * (IV < 0.02 = useless): WoE per level milli-quantized from exact
    * good/bad shares, IV as the exact integer dot product of quantized
    * factors. Pairs with the KS separation face (q517). */
  def q568: Q = {
    val woe = "CAST(floor(CAST(ln((CAST(g AS DOUBLE)" +
      " * CAST(tb AS DOUBLE)) / (CAST(b AS DOUBLE)" +
      " * CAST(tg AS DOUBLE))) AS DECIMAL(28,9)) * 1000) AS BIGINT)"
    Q("q568_weight_of_evidence",
      Some(s"""
        |WITH l AS (
        |  SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS lv,
        |         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem),
        |lv AS (
        |  SELECT lv, sum(y) AS b, sum(1 - y) AS g
        |  FROM l GROUP BY 1 HAVING sum(y) > 0 AND sum(1 - y) > 0),
        |tt AS (SELECT sum(b) AS tb, sum(g) AS tg FROM lv),
        |woe AS (
        |  SELECT lv.lv, lv.g, lv.b, $woe AS woe_milli,
        |         (1000000 * lv.g) // tt.tg - (1000000 * lv.b) // tt.tb
        |           AS share_gap_micro
        |  FROM lv CROSS JOIN tt)
        |SELECT CAST(lv AS BIGINT) AS discount_level,
        |       CAST(woe_milli AS BIGINT) AS woe_milli,
        |       CAST(floor(CAST(CAST(share_gap_micro AS DOUBLE) * woe_milli / 1000000.0 AS DECIMAL(28,6))) AS BIGINT)
        |         AS iv_contrib_micro,
        |       CAST((SELECT sum(CAST(floor(CAST(CAST(share_gap_micro AS DOUBLE) * woe_milli / 1000000.0 AS DECIMAL(28,6))) AS BIGINT))
        |             FROM woe) AS BIGINT) AS iv_total_micro
        |FROM woe ORDER BY discount_level
        |""".stripMargin)) { (s, dir) =>
      val lv = Tables.lineitem(s, dir)
        .select(expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)")
          .as("lv"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
        .groupBy(col("lv"))
        .agg(sum(col("y")).as("b"), sum(lit(1L) - col("y")).as("g"))
        .where(col("b") > 0 && col("g") > 0)
      val tt = lv.agg(sum(col("b")).as("tb"), sum(col("g")).as("tg"))
      val woeT = lv.crossJoin(broadcast(tt))
        .select(col("lv"),
          expr(woe).as("woe_milli"),
          expr("(1000000 * g) div tg - (1000000 * b) div tb")
            .as("share_gap_micro"))
        .materialize() // 11-level dim
      val tot = woeT.agg(sum(expr("CAST(floor(CAST(CAST(share_gap_micro AS DOUBLE) * woe_milli / 1000000.0 AS DECIMAL(28,6))) AS BIGINT)")).as("iv_total_micro"))
      woeT.crossJoin(broadcast(tot))
        .select(col("lv").as("discount_level"), col("woe_milli"),
          expr("CAST(floor(CAST(CAST(share_gap_micro AS DOUBLE) * woe_milli / 1000000.0 AS DECIMAL(28,6))) AS BIGINT)").as("iv_contrib_micro"),
          col("iv_total_micro"))
        .orderBy(col("discount_level"))
    }
  }

  /** Sample-size planning curve: the n per arm a two-proportion test
    * needs at 80% power / 5% α for minimum detectable effects of
    * 5/10/20/50‰ around the observed return rate — the experiment-
    * design table q448 (observed-MDE) reads backwards. Embedded
    * z-constants; one pinned double per row. */
  def q569: Q = {
    val z = "(1.959963984540054 + 0.8416212335729142)"
    Q("q569_sample_size_curve",
      Some(s"""
        |WITH p AS (
        |  SELECT (1000 * sum(CASE WHEN l_returnflag = 'R' THEN 1
        |          ELSE 0 END)) // count(*) AS p_milli
        |  FROM lineitem),
        |mde(d) AS (VALUES (5), (10), (20), (50))
        |SELECT CAST(mde.d AS BIGINT) AS mde_permille,
        |       (SELECT CAST(p_milli AS BIGINT) FROM p) AS base_rate_milli,
        |       CAST(ceil($z * $z
        |            * 2.0 * (CAST(p.p_milli AS DOUBLE) / 1000.0)
        |            * (1.0 - CAST(p.p_milli AS DOUBLE) / 1000.0)
        |            / ((CAST(mde.d AS DOUBLE) / 1000.0)
        |               * (CAST(mde.d AS DOUBLE) / 1000.0))) AS BIGINT)
        |         AS n_per_arm
        |FROM mde CROSS JOIN p ORDER BY mde_permille
        |""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val p = Tables.lineitem(s, dir)
        .agg(expr("(1000 * sum(CASE WHEN l_returnflag = 'R' THEN 1" +
          " ELSE 0 END)) div count(1)").as("p_milli"))
      val mde = Seq(5, 10, 20, 50).toDF("d")
      mde.crossJoin(broadcast(p))
        .select(col("d").cast("long").as("mde_permille"),
          col("p_milli").as("base_rate_milli"),
          expr(s"""CAST(ceil($z * $z
              * 2.0 * (CAST(p_milli AS DOUBLE) / 1000.0)
              * (1.0 - CAST(p_milli AS DOUBLE) / 1000.0)
              / ((CAST(d AS DOUBLE) / 1000.0)
                 * (CAST(d AS DOUBLE) / 1000.0))) AS BIGINT)""")
            .as("n_per_arm"))
        .orderBy(col("mde_permille"))
    }
  }

  /** Geometric-Brownian calibration of daily revenue: drift and
    * volatility from milli-quantized daily log returns (zero days
    * excluded under a stated positivity contract), annualized, with
    * the 1-year 5th-percentile path multiple exp(μ̃−1.645σ√T) — the
    * Monte-Carlo-free risk readout. One exp at the end. */
  def q570: Q = {
    val mu = "CAST(sr AS DOUBLE) / CAST(n AS DOUBLE) / 1000.0"
    val sg = "sqrt((CAST(qr AS DOUBLE) / CAST(n AS DOUBLE)" +
      s" - ($mu) * 1000.0 * ($mu) * 1000.0) / 1000000.0)"
    val ann = "365.0"
    val p5 = s"exp(($mu) * $ann - 1.6448536269514722" +
      s" * ($sg) * sqrt($ann))"
    def qz(e: String, name: String) =
      s"CAST(floor(CAST($e AS DECIMAL(28,6)) * 1000) AS BIGINT) AS $name"
    Q("q570_gbm_calibration",
      Some(s"""
        |WITH ${Scaffolds.sqlDailyDollars},
        |pos AS (SELECT day, x FROM grid WHERE x > 0),
        |lr AS (
        |  SELECT CAST(floor(CAST(ln(CAST(b.x AS DOUBLE)
        |             / CAST(a.x AS DOUBLE)) AS DECIMAL(28,9)) * 1000)
        |           AS BIGINT) AS r
        |  FROM pos a JOIN pos b ON b.day = a.day + 1),
        |mo AS (SELECT count(*) AS n, sum(r) AS sr,
        |              sum(CAST(r AS HUGEINT) * r) AS qr FROM lr)
        |SELECT CAST(n AS BIGINT) AS n_returns,
        |       ${qz(s"($mu) * $ann", "annual_drift_milli")},
        |       ${qz(s"($sg) * sqrt($ann)", "annual_vol_milli")},
        |       ${qz(p5, "year_p5_multiple_milli")}
        |FROM mo
        |""".stripMargin)) { (s, dir) =>
      val grid = Scaffolds.dailyDollars(s, dir)
      val pos = grid.where(col("x") > 0)
        .select(col("day"), col("x"))
        .materialize()
      val lr = pos.as("a")
        .join(pos.select((col("day") - 1).as("bday"), col("x").as("bx")),
          col("bday") === col("day"))
        .select(expr("CAST(floor(CAST(ln(CAST(bx AS DOUBLE)" +
          " / CAST(x AS DOUBLE)) AS DECIMAL(28,9)) * 1000) AS BIGINT)")
          .as("r"))
      val mo = lr.agg(count(lit(1)).as("n"), sum(col("r")).as("sr"),
        sum(col("r").cast("decimal(38,0)") * col("r")).as("qr"))
      mo.select(col("n").as("n_returns"),
        expr(qz(s"($mu) * $ann", "annual_drift_milli")),
        expr(qz(s"($sg) * sqrt($ann)", "annual_vol_milli")),
        expr(qz(p5, "year_p5_multiple_milli")))
    }
  }
}
