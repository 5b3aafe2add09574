package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Materialize.MatOps
import graft.Tables

/** Round-9 order-flow/queueing wave: Kingman VUT components per year,
  * the Fano factor of order arrivals at three time scales, busy-period
  * (excursion) structure of the daily arrival series, per-priority
  * fulfillment-stage quantiles, and the load-vs-latency slowdown
  * curve. Scale discipline: interarrival moments come EXACTLY from the
  * day-grain count dim (within-day arrivals tie at diff 0, so Σd and
  * Σd² decompose over active-day gaps — no per-order lag window ever
  * sorts the fact table), span quantiles ride the value-HISTOGRAM walk
  * (spans are small day counts), and the only windows run over
  * calendar dims. */
object FlowQueries {

  val all: Seq[Q] = Seq(q671, q672, q673, q674, q675)

  /** Day index of an order (UTC day grain, the repo-wide idiom). */
  private def sqlDay(c: String) = s"epoch_us($c) // 86400000000"
  private def daySpark(c: String) =
    expr(s"unix_micros(CAST($c AS TIMESTAMP)) div 86400000000")

  /** Kingman VUT components per order year: interarrival mean and SCV
    * (c_a²), service mean and SCV (c_s², service = order fulfillment
    * span in days), and the heavy-traffic G/G/1 wait estimate
    * Wq ≈ ρ/(1−ρ)·(c_a²+c_s²)/2·τ_s at the stated ρ = 0.8. The
    * interarrival moments are EXACT from the day dim: sorting arrivals
    * day-grain makes within-day diffs 0, so Σd = last−first and
    * Σd² = Σ gap² over consecutive ACTIVE days — a ≤366-row window per
    * year, never a fact sort. */
  def q671: Q = {
    // c_a² = (n−1)·Σd²/(Σd)² − 1 exactly; written once, shared text
    val ca2 = "(CAST(na - 1 AS DOUBLE) * CAST(sd2 AS DOUBLE)" +
      " / (CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)) - 1.0)"
    val cs2 = "(CAST(ns AS DOUBLE) * CAST(ss2 AS DOUBLE)" +
      " / (CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)) - 1.0)"
    val tau = "(CAST(ss AS DOUBLE) / CAST(ns AS DOUBLE))"
    def milli(e: String, name: String) =
      s"CAST(floor(($e) * 1000.0) AS BIGINT) AS $name"
    Q("q671_kingman_vut",
      Some(s"""
        |WITH od AS (
        |  SELECT o_orderkey AS ok, year(o_orderdate) AS yr,
        |         ${sqlDay("o_orderdate")} AS d
        |  FROM orders),
        |dc AS (SELECT yr, d, count(*) AS c FROM od GROUP BY 1, 2),
        |gap AS (
        |  SELECT yr, d - lag(d) OVER (PARTITION BY yr ORDER BY d) AS g
        |  FROM dc),
        |g2 AS (SELECT yr, coalesce(sum(g * g), 0) AS sd2
        |       FROM gap GROUP BY 1),
        |ia0 AS (
        |  SELECT yr, sum(c) AS na, max(d) - min(d) AS sd
        |  FROM dc GROUP BY 1),
        |ia AS (SELECT ia0.yr, ia0.na, ia0.sd, g2.sd2
        |       FROM ia0 JOIN g2 ON g2.yr = ia0.yr),
        |sp AS (
        |  SELECT o.o_orderkey, year(o.o_orderdate) AS yr,
        |         max(${sqlDay("l.l_shipdate")})
        |           - ${sqlDay("o.o_orderdate")} AS s
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1, 2, o.o_orderdate),
        |sv AS (SELECT yr, count(*) AS ns, sum(s) AS ss,
        |              sum(s * s) AS ss2 FROM sp GROUP BY 1),
        |jj AS (SELECT ia.yr, ia.na, ia.sd, ia.sd2, sv.ns, sv.ss, sv.ss2
        |       FROM ia JOIN sv ON sv.yr = ia.yr
        |       WHERE ia.na > 1 AND ia.sd > 0 AND sv.ss > 0)
        |SELECT CAST(yr AS BIGINT) AS year,
        |       CAST(na AS BIGINT) AS n_orders,
        |       ${milli(ca2, "ca2_milli")},
        |       ${milli(cs2, "cs2_milli")},
        |       ${milli(tau, "mean_span_milli")},
        |       ${milli(s"4.0 * (($ca2) + ($cs2)) / 2.0 * ($tau)",
        "kingman_wq_milli")}
        |FROM jj ORDER BY year
        |""".stripMargin)) { (s, dir) =>
      val od = Tables.orders(s, dir)
        .select(col("o_orderkey").as("ok"),
          year(col("o_orderdate")).as("yr"),
          daySpark("o_orderdate").as("d"))
      val dc = od.groupBy(col("yr"), col("d"))
        .agg(count(lit(1)).as("c"))
        .materialize() // ≤366 rows per year
      val gap = dc.select(col("yr"),
        (col("d") - lag(col("d"), 1).over(
          Window.partitionBy(col("yr")).orderBy(col("d")))).as("g"))
      val ia = dc.groupBy(col("yr"))
        .agg(sum(col("c")).as("na"),
          (max(col("d")) - min(col("d"))).as("sd"))
        .join(gap.groupBy(col("yr"))
          .agg(coalesce(sum(col("g") * col("g")), lit(0L)).as("sd2")),
          Seq("yr"))
      val sp = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderdate"),
          year(col("o_orderdate")).as("yr"),
          daySpark("o_orderdate").as("od"))
        .join(Tables.lineitem(s, dir)
          .select(col("l_orderkey"), daySpark("l_shipdate").as("sd")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"), col("yr"), col("od"))
        .agg((max(col("sd")) - max(col("od"))).as("s"))
      val sv = sp.groupBy(col("yr"))
        .agg(count(lit(1)).as("ns"), sum(col("s")).as("ss"),
          sum(col("s") * col("s")).as("ss2"))
      ia.join(sv, Seq("yr"))
        .where(col("na") > 1 && col("sd") > 0 && col("ss") > 0)
        .select(col("yr").cast("long").as("year"),
          col("na").as("n_orders"),
          expr(milli(ca2, "ca2_milli")),
          expr(milli(cs2, "cs2_milli")),
          expr(milli(tau, "mean_span_milli")),
          expr(milli(s"4.0 * (($ca2) + ($cs2)) / 2.0 * ($tau)",
            "kingman_wq_milli")))
        .orderBy(col("year"))
    }
  }

  /** Fano factor (index of dispersion) of order arrivals at 1-, 7- and
    * 28-day block scales: Fano = var/mean of block counts, EXACT
    * rational (1000·(n_b·Σc² − (Σc)²)) // ((n_b−1)·Σc) — the
    * burstiness fingerprint (Poisson ⇒ 1 at every scale; growth with
    * scale ⇒ clustered arrivals). Blocks are calendar-derived; the
    * scale dim is a 3-row literal. */
  def q672: Q = Q(
    "q672_fano_factor_scales",
    Some(s"""
      |WITH od AS (
      |  SELECT ${sqlDay("o_orderdate")} AS d FROM orders),
      |sc(s) AS (VALUES (1), (7), (28)),
      |bc AS (
      |  SELECT sc.s, od.d // sc.s AS blk, count(*) AS c
      |  FROM od CROSS JOIN sc GROUP BY 1, 2),
      |mo AS (
      |  SELECT s, count(*) AS nb, sum(c) AS sx,
      |         sum(CAST(c AS HUGEINT) * c) AS sxx
      |  FROM bc GROUP BY 1)
      |SELECT CAST(s AS BIGINT) AS scale_days,
      |       CAST(nb AS BIGINT) AS n_blocks,
      |       CAST((1000 * sx) // nb AS BIGINT) AS mean_milli,
      |       CAST((1000 * (nb * sxx - CAST(sx AS HUGEINT) * sx))
      |            // ((nb - 1) * CAST(sx AS HUGEINT)) AS BIGINT)
      |         AS fano_milli
      |FROM mo ORDER BY scale_days
      |""".stripMargin)) { (s, dir) =>
    import s.implicits._
    val od = Tables.orders(s, dir)
      .select(daySpark("o_orderdate").as("d"))
    val sc = Seq(1L, 7L, 28L).toDF("s")
    od.crossJoin(broadcast(sc))
      .groupBy(col("s"), expr("d div s").as("blk"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("nb"), sum(col("c")).as("sx"),
        sum(col("c").cast("decimal(38,0)") * col("c")).as("sxx"))
      .select(col("s").as("scale_days"), col("nb").as("n_blocks"),
        expr("(1000 * sx) div nb").as("mean_milli"),
        expr("CAST((1000 * (nb * sxx - CAST(sx AS DECIMAL(38,0)) * sx))" +
          " div ((nb - 1) * CAST(sx AS DECIMAL(38,0))) AS BIGINT)")
          .as("fano_milli"))
      .orderBy(col("scale_days"))
  }

  /** Busy-period structure of daily order arrivals: maximal runs of
    * consecutive ACTIVE days whose count exceeds the global mean
    * (strict), via the day − row_number island trick on the
    * calendar-bounded day dim. Reports the excursion count, longest
    * and mean length, and the largest integrated excess (Σ(c − ⌈mean⌉)
    * over one excursion) — the "how long do overload bursts last"
    * audit. */
  def q673: Q = Q(
    "q673_busy_periods",
    Some(s"""
      |WITH dc AS (
      |  SELECT ${sqlDay("o_orderdate")} AS d, count(*) AS c
      |  FROM orders GROUP BY 1),
      |mu AS (SELECT sum(c) // count(*) AS m FROM dc),
      |hot AS (
      |  SELECT d, c - mu.m AS ex,
      |         d - row_number() OVER (ORDER BY d) AS grp
      |  FROM dc CROSS JOIN mu WHERE c > mu.m),
      |runs AS (
      |  SELECT grp, count(*) AS len, sum(ex) AS area
      |  FROM hot GROUP BY 1)
      |SELECT CAST((SELECT count(*) FROM dc) AS BIGINT) AS n_days,
      |       CAST((SELECT m FROM mu) AS BIGINT) AS mean_floor,
      |       CAST(count(*) AS BIGINT) AS n_excursions,
      |       CAST(coalesce(max(len), 0) AS BIGINT) AS max_len,
      |       CAST(CASE WHEN count(*) = 0 THEN 0
      |            ELSE (1000 * sum(len)) // count(*) END AS BIGINT)
      |         AS mean_len_milli,
      |       CAST(coalesce(max(area), 0) AS BIGINT) AS max_excess
      |FROM runs
      |""".stripMargin)) { (s, dir) =>
    val dc = Tables.orders(s, dir)
      .groupBy(daySpark("o_orderdate").as("d"))
      .agg(count(lit(1)).as("c"))
      .materialize() // day dim
    val nd = dc.agg(count(lit(1)).as("ndays"),
      expr("sum(c) div count(1)").as("m"))
    val hot = dc.crossJoin(broadcast(nd))
      .where(col("c") > col("m"))
      .withColumn("grp",
        col("d") - row_number().over(Window.orderBy(col("d")))) // day dim
      .select(col("grp"), (col("c") - col("m")).as("ex"))
    val runs = hot.groupBy(col("grp"))
      .agg(count(lit(1)).as("len"), sum(col("ex")).as("area"))
    runs.agg(count(lit(1)).as("ne"),
        coalesce(max(col("len")), lit(0L)).as("mx"),
        sum(col("len")).as("sl"),
        coalesce(max(col("area")), lit(0L)).as("ma"))
      .crossJoin(broadcast(nd))
      .select(col("ndays").as("n_days"), col("m").as("mean_floor"),
        col("ne").as("n_excursions"), col("mx").as("max_len"),
        when(col("ne") === 0, 0L)
          .otherwise(expr("(1000 * sl) div ne")).as("mean_len_milli"),
        col("ma").as("max_excess"))
  }

  /** Fulfillment-stage quantiles per order priority: stage 1 = order
    * date → FIRST ship, stage 2 = first ship → LAST ship (the fan-out
    * tail), p50/p90 per (priority, stage) via the value-HISTOGRAM
    * cumulative walk (spans are small day counts — the walk is bounded
    * by value cardinality, not the order dim; exactly
    * OrderStats.weightedQuantilesDisc with unit weights). */
  def q674: Q = Q(
    "q674_priority_stage_quantiles",
    Some(s"""
      |WITH sp AS (
      |  SELECT o.o_orderpriority AS pr,
      |         min(${sqlDay("l.l_shipdate")})
      |           - ${sqlDay("o.o_orderdate")} AS s1,
      |         max(${sqlDay("l.l_shipdate")})
      |           - min(${sqlDay("l.l_shipdate")}) AS s2
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  GROUP BY o.o_orderkey, 1, o.o_orderdate),
      |x AS (
      |  SELECT pr, 1 AS st, s1 AS v FROM sp
      |  UNION ALL SELECT pr, 2 AS st, s2 AS v FROM sp),
      |h AS (SELECT pr, st, v, count(*) AS c FROM x GROUP BY 1, 2, 3),
      |hr AS (
      |  SELECT pr, st, v, c,
      |         sum(c) OVER (PARTITION BY pr, st ORDER BY v) AS cw,
      |         sum(c) OVER (PARTITION BY pr, st) AS w
      |  FROM h),
      |pt(p) AS (VALUES (500), (900)),
      |qq AS (
      |  SELECT pr, st, pt.p, v
      |  FROM hr JOIN pt ON hr.cw - hr.c < (pt.p * hr.w + 999) // 1000
      |                 AND (pt.p * hr.w + 999) // 1000 <= hr.cw)
      |SELECT pr AS priority, CAST(st AS BIGINT) AS stage,
      |       CAST(max(CASE WHEN p = 500 THEN v END) AS BIGINT)
      |         AS p50_days,
      |       CAST(max(CASE WHEN p = 900 THEN v END) AS BIGINT)
      |         AS p90_days
      |FROM qq GROUP BY 1, 2 ORDER BY 1, 2
      |""".stripMargin)) { (s, dir) =>
    val sp = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderpriority").as("pr"),
        daySpark("o_orderdate").as("od"))
      .join(Tables.lineitem(s, dir)
        .select(col("l_orderkey"), daySpark("l_shipdate").as("sd")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("pr"), col("od"))
      .agg((min(col("sd")) - max(col("od"))).as("s1"),
        (max(col("sd")) - min(col("sd"))).as("s2"))
      .materialize()
    val x = sp.select(col("pr"), lit(1L).as("st"), col("s1").as("v"))
      .unionAll(sp.select(col("pr"), lit(2L).as("st"), col("s2").as("v")))
      .withColumn("one", lit(1L))
    val q = graft.operators.OrderStats.weightedQuantilesDisc(
      x, Seq("pr", "st"), "v", "one", Seq(500, 900))
    q.groupBy(col("pr").as("priority"), col("st").as("stage"))
      .agg(max(when(col("permille") === 500, col("value"))).as("p50_days"),
        max(when(col("permille") === 900, col("value"))).as("p90_days"))
      .orderBy(col("priority"), col("stage"))
  }

  /** Load-vs-latency slowdown curve: months bucketed by arrival-count
    * quintile (rank cut over the ~84-month calendar dim), each bucket
    * reporting its exact mean fulfillment span — the empirical
    * "latency rises with utilization" curve q671's Kingman estimate
    * predicts. One fact pass builds the month frame; everything after
    * is month-dim-sized. */
  def q675: Q = Q(
    "q675_load_latency_curve",
    Some(s"""
      |WITH sp AS (
      |  SELECT o.o_orderkey,
      |         year(o.o_orderdate) * 12 + month(o.o_orderdate) AS mo,
      |         max(${sqlDay("l.l_shipdate")})
      |           - ${sqlDay("o.o_orderdate")} AS s
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  GROUP BY 1, 2, o.o_orderdate),
      |mm AS (SELECT mo, count(*) AS n, sum(s) AS ss FROM sp GROUP BY 1),
      |rk AS (
      |  SELECT mo, n, ss,
      |         row_number() OVER (ORDER BY n, mo) AS r,
      |         count(*) OVER () AS nm
      |  FROM mm),
      |bk AS (SELECT ((r - 1) * 5) // nm AS b, n, ss FROM rk)
      |SELECT CAST(b AS BIGINT) AS load_quintile,
      |       CAST(count(*) AS BIGINT) AS n_months,
      |       CAST(sum(n) AS BIGINT) AS n_orders,
      |       CAST((1000 * sum(ss)) // sum(n) AS BIGINT)
      |         AS mean_span_milli
      |FROM bk GROUP BY 1 ORDER BY 1
      |""".stripMargin)) { (s, dir) =>
    val sp = Tables.orders(s, dir)
      .select(col("o_orderkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .as("mo"),
        daySpark("o_orderdate").as("od"))
      .join(Tables.lineitem(s, dir)
        .select(col("l_orderkey"), daySpark("l_shipdate").as("sd")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("mo"))
      .agg((max(col("sd")) - max(col("od"))).as("s"))
    val mm = sp.groupBy(col("mo"))
      .agg(count(lit(1)).as("n"), sum(col("s")).as("ss"))
      .materialize() // ~84-month dim
    val rk = mm
      .withColumn("r", row_number().over(
        Window.orderBy(col("n"), col("mo")))) // month dim window
      .crossJoin(broadcast(mm.agg(count(lit(1)).as("nm"))))
    rk.select(expr("((r - 1) * 5) div nm").as("b"), col("n"), col("ss"))
      .groupBy(col("b").as("load_quintile"))
      .agg(count(lit(1)).as("n_months"), sum(col("n")).as("n_orders"),
        expr("(1000 * sum(ss)) div sum(n)").as("mean_span_milli"))
      .orderBy(col("load_quintile"))
  }
}
