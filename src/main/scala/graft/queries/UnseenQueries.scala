package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-10 "estimating the unseen" wave: German-tank population
  * estimation from the RETURNED-line order-key sample (with ground
  * truth available for the error audit), an estimator comparison
  * table, the coupon-collector brand curve, Good–Turing missing mass
  * on bigram occurrences, and the species-accumulation curve of part
  * types.
  *
  * Exactness: every estimator is an exact scaled rational of integer
  * aggregates (max / count / sum / singleton counts); errors compare
  * against the IN-DATA truth (full-table max / distinct counts), so
  * the audit is closed-form — no simulation, no randomness.
  *
  * Scale: each face is one or two fact scans collapsing straight to
  * scalars or species/brand dims; no windows over fact-scaled
  * frames. */
object UnseenQueries {

  val all: Seq[Q] = Seq(q1031, q1032, q1033, q1034, q1035)

  /** German-tank estimate of the maximum order key from the returned
    * sample: m(k+1)/k − 1 (MVU), with the truth and the error. */
  def q1031: Q = Q(
    "q1031_german_tank",
    Some("""
      |WITH smp AS (
      |  SELECT count(DISTINCT l_orderkey) AS k,
      |         max(l_orderkey) AS m
      |  FROM lineitem WHERE l_returnflag = 'R'),
      |tr AS (SELECT max(o_orderkey) AS truth FROM orders)
      |SELECT CAST(k AS BIGINT) AS sample_size,
      |       CAST(m AS BIGINT) AS sample_max,
      |       CAST((1000 * m * (k + 1)) // k - 1000 AS BIGINT)
      |         AS mvu_estimate_milli,
      |       CAST(truth AS BIGINT) AS true_max_key,
      |       CAST(((1000 * m * (k + 1)) // k - 1000 - 1000 * truth)
      |            // truth AS BIGINT) AS err_milli
      |FROM smp CROSS JOIN tr
      |""".stripMargin)) { (s, dir) =>
    val smp = Tables.lineitem(s, dir)
      .where(col("l_returnflag") === "R")
      .agg(countDistinct(col("l_orderkey")).as("k"),
        max(col("l_orderkey")).as("m"))
    val tr = Tables.orders(s, dir)
      .agg(max(col("o_orderkey")).as("truth"))
    smp.crossJoin(broadcast(tr))
      .select(col("k").cast("long").as("sample_size"),
        col("m").cast("long").as("sample_max"),
        expr("CAST((1000 * m * (k + 1)) div k - 1000 AS BIGINT)")
          .as("mvu_estimate_milli"),
        col("truth").cast("long").as("true_max_key"),
        expr("CAST(((1000 * m * (k + 1)) div k - 1000 - 1000 * truth)" +
          " div truth AS BIGINT)").as("err_milli"))
  }

  /** Estimator comparison: max / MVU / moment (2·mean − 1) / gap-based
    * serial-number estimators, each with its milli error vs truth. */
  def q1032: Q = Q(
    "q1032_serial_estimators",
    Some("""
      |WITH smp AS (
      |  SELECT count(DISTINCT l_orderkey) AS k,
      |         max(l_orderkey) AS m,
      |         sum(DISTINCT l_orderkey) AS sk
      |  FROM lineitem WHERE l_returnflag = 'R'),
      |tr AS (SELECT max(o_orderkey) AS truth FROM orders),
      |es AS (
      |  SELECT 'max' AS estimator, 1000 * m AS est_milli, truth
      |  FROM smp CROSS JOIN tr
      |  UNION ALL
      |  SELECT 'mvu', (1000 * m * (k + 1)) // k - 1000, truth
      |  FROM smp CROSS JOIN tr
      |  UNION ALL
      |  SELECT 'moment', (2000 * sk) // k - 1000, truth
      |  FROM smp CROSS JOIN tr
      |  UNION ALL
      |  SELECT 'gap', 1000 * (m + (m - k) // k), truth
      |  FROM smp CROSS JOIN tr)
      |SELECT estimator, CAST(est_milli AS BIGINT) AS est_milli,
      |       CAST((1000 * (est_milli - 1000 * truth)) // (1000 * truth)
      |            AS BIGINT) AS err_milli
      |FROM es ORDER BY estimator
      |""".stripMargin)) { (s, dir) =>
    val smp = Tables.lineitem(s, dir)
      .where(col("l_returnflag") === "R")
      .select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("k"), max(col("l_orderkey")).as("m"),
        sum(col("l_orderkey")).as("sk"))
    val tr = Tables.orders(s, dir)
      .agg(max(col("o_orderkey")).as("truth"))
    val base = smp.crossJoin(broadcast(tr))
    val es = base.select(lit("max").as("estimator"),
        (col("m") * 1000).cast("decimal(38,0)").as("est_milli"),
        col("truth"))
      .unionAll(base.select(lit("mvu"),
        expr("CAST((1000 * m * (k + 1)) div k - 1000 AS DECIMAL(38,0))"),
        col("truth")))
      .unionAll(base.select(lit("moment"),
        expr("CAST((2000 * sk) div k - 1000 AS DECIMAL(38,0))"),
        col("truth")))
      .unionAll(base.select(lit("gap"),
        expr("CAST(1000 * (m + (m - k) div k) AS DECIMAL(38,0))"),
        col("truth")))
    es.select(col("estimator"),
        col("est_milli").cast("long").as("est_milli"),
        expr("CAST((1000 * (est_milli - 1000 * truth))" +
          " div (1000 * truth) AS BIGINT)").as("err_milli"))
      .orderBy(col("estimator"))
  }

  /** Good–Turing missing mass over bigram OCCURRENCES (token counts,
    * not doc-distinct): M₀ = n₁/N, plus the Chao lower bound on
    * unseen types n₁²/(2n₂). */
  def q1033: Q = Q(
    "q1033_missing_mass",
    Some("""
      |WITH tk AS (SELECT string_split(lower(text), ' ') AS t
      |            FROM documents),
      |bg AS (
      |  SELECT unnest(list_transform(range(1, len(t)),
      |         i -> t[i] || ' ' || t[i + 1])) AS b
      |  FROM tk WHERE len(t) >= 2),
      |fc AS (SELECT b, count(*) AS c FROM bg GROUP BY 1),
      |mo AS (SELECT count(*) AS n_types, sum(c) AS n_tokens,
      |              sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS n1,
      |              sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS n2
      |       FROM fc)
      |SELECT CAST(n_types AS BIGINT) AS n_types,
      |       CAST(n_tokens AS BIGINT) AS n_tokens,
      |       CAST(n1 AS BIGINT) AS n_singletons,
      |       CAST((1000000 * n1) // n_tokens AS BIGINT)
      |         AS missing_mass_ppm,
      |       CAST(CASE WHEN n2 = 0 THEN NULL
      |            ELSE (n1 * n1) // (2 * n2) END AS BIGINT)
      |         AS chao_unseen_types
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    val fc = Tables.documents(s, dir)
      .select(split(lower(col("text")), " ").as("t"))
      .where(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(t) - 2)," +
          " i -> concat(t[i], ' ', t[i + 1]))")).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("c"))
    fc.agg(count(lit(1)).as("n_types"), sum(col("c")).as("n_tokens"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("n2"))
      .select(col("n_types"), col("n_tokens"),
        col("n1").as("n_singletons"),
        expr("CAST((1000000 * n1) div n_tokens AS BIGINT)")
          .as("missing_mass_ppm"),
        expr("CAST(CASE WHEN n2 = 0 THEN NULL" +
          " ELSE (n1 * n1) div (2 * n2) END AS BIGINT)")
          .as("chao_unseen_types"))
  }

  /** Coupon-collector audit on brands: first-appearance calendar of
    * the 25 brands — completion day, the 5 latest arrivals, and the
    * draw-based expectation 25·H₂₅ (micro) for context. */
  def q1034: Q = Q(
    "q1034_coupon_collector",
    Some("""
      |WITH fa AS (
      |  SELECT p.p_brand AS br, min(CAST(l.l_shipdate AS DATE)) AS d0
      |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |  GROUP BY 1),
      |cal AS (SELECT min(CAST(l_shipdate AS DATE)) AS dmin
      |        FROM lineitem),
      |hh AS (SELECT sum(1000000 // g) AS h25_micro
      |       FROM (SELECT * FROM range(1, 26) r(g))),
      |mo AS (SELECT count(*) AS n_brands,
      |              max(datediff('day', cal.dmin, fa.d0)) + 1
      |                AS completion_days,
      |              min(datediff('day', cal.dmin, fa.d0)) + 1
      |                AS first_day
      |       FROM fa CROSS JOIN cal)
      |SELECT CAST(n_brands AS BIGINT) AS n_brands,
      |       CAST(first_day AS BIGINT) AS first_brand_day,
      |       CAST(completion_days AS BIGINT) AS completion_day,
      |       CAST(25 * (SELECT h25_micro FROM hh) AS BIGINT)
      |         AS expected_draws_micro
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    val fa = Tables.lineitem(s, dir)
      .select(col("l_partkey").as("pk"),
        col("l_shipdate").cast("date").as("d"))
      .join(broadcast(Tables.part(s, dir)
        .select(col("p_partkey").as("pk"), col("p_brand").as("br"))),
        "pk")
      .groupBy(col("br")).agg(min(col("d")).as("d0"))
    val cal = Tables.lineitem(s, dir)
      .agg(min(col("l_shipdate").cast("date")).as("dmin"))
    val h25 = (1 to 25).map(1000000L / _).sum
    fa.crossJoin(broadcast(cal))
      .agg(count(lit(1)).as("n_brands"),
        (max(datediff(col("d0"), col("dmin"))) + 1)
          .as("completion_days"),
        (min(datediff(col("d0"), col("dmin"))) + 1).as("first_day"))
      .select(col("n_brands"),
        col("first_day").cast("long").as("first_brand_day"),
        col("completion_days").cast("long").as("completion_day"),
        lit(25L * h25).as("expected_draws_micro"))
  }

  /** Species-accumulation curve: distinct part TYPES seen by each
    * decile of the observed shipping calendar. */
  def q1035: Q = Q(
    "q1035_species_accumulation",
    Some("""
      |WITH fa AS (
      |  SELECT p.p_type AS sp, min(CAST(l.l_shipdate AS DATE)) AS d0
      |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |  GROUP BY 1),
      |cal AS (SELECT min(CAST(l_shipdate AS DATE)) AS dmin,
      |               max(CAST(l_shipdate AS DATE)) AS dmax
      |        FROM lineitem),
      |dc AS (SELECT * FROM range(1, 11) r(dec))
      |SELECT CAST(dc.dec AS BIGINT) AS decile,
      |       CAST(sum(CASE WHEN 10 * datediff('day', cal.dmin, fa.d0)
      |            <= dc.dec * datediff('day', cal.dmin, cal.dmax)
      |            THEN 1 ELSE 0 END) AS BIGINT) AS n_species_seen
      |FROM dc CROSS JOIN cal CROSS JOIN fa
      |GROUP BY 1 ORDER BY decile
      |""".stripMargin)) { (s, dir) =>
    import s.implicits._
    val fa = Tables.lineitem(s, dir)
      .select(col("l_partkey").as("pk"),
        col("l_shipdate").cast("date").as("d"))
      .join(broadcast(Tables.part(s, dir)
        .select(col("p_partkey").as("pk"), col("p_type").as("sp"))),
        "pk")
      .groupBy(col("sp")).agg(min(col("d")).as("d0"))
    val cal = Tables.lineitem(s, dir)
      .agg(min(col("l_shipdate").cast("date")).as("dmin"),
        max(col("l_shipdate").cast("date")).as("dmax"))
    val dc = broadcast((1 to 10).map(_.toLong).toDF("dec"))
    dc.crossJoin(broadcast(cal)).crossJoin(fa)
      .groupBy(col("dec"))
      .agg(sum(when(datediff(col("d0"), col("dmin")) * 10
        <= col("dec") * datediff(col("dmax"), col("dmin")), 1L)
        .otherwise(0L)).as("n_species_seen"))
      .select(col("dec").cast("long").as("decile"),
        col("n_species_seen"))
      .orderBy(col("decile"))
  }
}
