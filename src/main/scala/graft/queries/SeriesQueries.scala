package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Materialize.MatOps
import graft.Tables

/** Round-7 graph + time-series wave: co-purchase triangle census,
  * Theil-Sen robust trend, consecutive-day streak islands, the
  * Wald-Wolfowitz runs test, and the day-of-week × hour load heatmap —
  * the "shape of the series/graph" analytics a training-data pipeline
  * runs before trusting aggregate stats. All exact-integer (cents /
  * ppm / micro-quantized scalars) end to end.
  */
object SeriesQueries {

  val all: Seq[Q] = Seq(q326, q327, q328, q329, q330, q336, q337,
    q339, q340, q345, q348, q356, q357, q365, q376, q383, q385)

  /** 30-minute-gap sessionization CTEs (e/o/g) shared by q336 and
    * q365 — ONE definition of "session" so bounce and conversion can
    * never disagree about boundaries. Emits g(user_id, t, event_id,
    * event_type, grp). */
  private[queries] def sqlSessionCtes: String =
    """e AS (
      |  SELECT user_id, epoch_ns(ts) AS t, event_id, event_type
      |  FROM events),
      |o AS (
      |  SELECT *, lag(t) OVER (PARTITION BY user_id
      |           ORDER BY t, event_id) AS prev
      |  FROM e),
      |g AS (
      |  SELECT *, sum(CASE WHEN prev IS NULL
      |                     OR t - prev >= 1800000000000
      |                     THEN 1 ELSE 0 END)
      |              OVER (PARTITION BY user_id ORDER BY t, event_id
      |                    ROWS UNBOUNDED PRECEDING) AS grp
      |  FROM o)""".stripMargin

  /** Spark side of [[sqlSessionCtes]]: events with the session group
    * id attached (columns user_id, ts, event_id, event_type, grp). */
  private[queries] def sessionized(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("ts"), 1).over(wOrd))
      .withColumn("grp", sum(when(col("prev").isNull ||
          col("ts") - col("prev") >= 1800000000000L, 1).otherwise(0))
        .over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("prev")
  }

  /** Support-pruned co-purchase edge CTEs (pi/e: parts co-ordered in
    * ≥2 distinct orders, pa < pb) shared by q326 and q385 — ONE
    * definition of the graph. */
  private[queries] def sqlCopurchaseEdgeCtes: String =
    """pi AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM pi a JOIN pi b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= 2)""".stripMargin

  /** Spark side of [[sqlCopurchaseEdgeCtes]]: the (pa, pb) edge dim,
    * materialized — every caller reads it several times. */
  /** Shared (s, v, d) BFS over a both-direction part-copurchase
    * adjacency (a, b) — delegates to the size-gated
    * [[SupplierGraph.bfsFrom]] and restores the historical column
    * names. */
  private[queries] def bfsOnCopurchase(e2: org.apache.spark.sql.DataFrame,
      src: org.apache.spark.sql.DataFrame, maxD: Int)
      : org.apache.spark.sql.DataFrame =
    SupplierGraph
      .bfsFrom(e2.select(col("a").as("ea"), col("b").as("ec")), src, maxD)
      .select(col("src").as("s"), col("node").as("v"), col("d"))

  private[queries] def copurchaseEdges(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    // five queries (q398/q428/q442/q457/q468) consume this fact-scaled
    // pair build — SpineCache makes it one build per process/pass
    // instead of one per consumer (edge dim round-trips parquet exactly)
    graft.sources.SpineCache.table(s, dir, "part_copurchase_edges",
      "lineitem") {
      val pi = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
        .materialize() // both legs of the pair self-join
      pi.join(pi.select(col("l_orderkey").as("__rk"),
          col("l_partkey").as("pb")),
        col("l_orderkey") === col("__rk") && col("l_partkey") < col("pb"))
        .groupBy(col("l_partkey").as("pa"), col("pb"))
        .agg(count(lit(1)).as("__sup"))
        .where(col("__sup") >= 2)
        .select(col("pa"), col("pb"))
    }

  /** Cumulative LTV curve: average per-user cumulative event value at
    * the end of each week since the user's first activity — the curve
    * a growth team plots under every acquisition decision. Week cents
    * are per-row rounding-cast exact; the cumulative sum runs over the
    * bounded week dim. */
  def q383: Q = Q(
    "q383_ltv_curve",
    Some("""
      |WITH e AS (
      |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS d,
      |         CAST(value * 100 AS BIGINT) AS cents
      |  FROM events),
      |f AS (SELECT user_id, min(d) AS f FROM e GROUP BY 1),
      |n AS (SELECT count(*) AS n_users FROM f),
      |w AS (
      |  SELECT (e.d - f.f) // 7 AS week, sum(e.cents) AS cents
      |  FROM e JOIN f USING (user_id) GROUP BY 1),
      |c AS (
      |  SELECT week, sum(cents) OVER (ORDER BY week) AS cum_cents
      |  FROM w)
      |SELECT CAST(c.week AS BIGINT) AS week,
      |       CAST(c.cum_cents AS BIGINT) AS cum_cents,
      |       CAST(c.cum_cents // n.n_users AS BIGINT)
      |         AS avg_ltv_cents
      |FROM c CROSS JOIN n ORDER BY week
      |""".stripMargin)) { (s, dir) =>
    val e = Tables.events(s, dir)
      .select(col("user_id"), expr("ts div 86400000000000").as("d"),
        (col("value") * 100).cast("decimal(38,0)").cast("long")
          .as("cents"))
    val f = e.groupBy(col("user_id")).agg(min(col("d")).as("f"))
    val n = f.agg(count(lit(1)).as("n_users"))
    e.join(f, Seq("user_id"))
      .groupBy(expr("(d - f) div 7").as("week"))
      .agg(sum(col("cents")).as("cents"))
      .withColumn("cum_cents", sum(col("cents")).over(
        Window.orderBy(col("week")) // week dim, bounded
          .rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(n))
      .select(col("week"), col("cum_cents"),
        expr("cum_cents div n_users").as("avg_ltv_cents"))
      .orderBy(col("week"))
  }

  /** Power-law tail of the co-purchase degree distribution: the Hill
    * estimator over the top-50 node degrees (each log term floor-
    * micro-quantized BEFORE the sum — the PSI discipline keeps the
    * k-term addition exact), plus the degree extremes. Degrees come
    * from q326's support-pruned edge dim; the tail is a distributed
    * top-k. */
  def q385: Q = {
    val k = 50
    Q("q385_degree_tail_hill",
      Some(s"""
        |WITH $sqlCopurchaseEdgeCtes,
        |deg AS (
        |  SELECT node, count(*) AS d
        |  FROM (SELECT pa AS node FROM e UNION ALL SELECT pb FROM e)
        |  GROUP BY 1),
        |top AS (
        |  SELECT d FROM (
        |    SELECT d, row_number() OVER (ORDER BY d DESC, node) AS rn
        |    FROM deg)
        |  WHERE rn <= $k),
        |mn AS (SELECT min(d) AS dk, count(*) AS tk FROM top),
        |lt AS (
        |  SELECT CAST(floor(CAST(ln(CAST(top.d AS DOUBLE)
        |           / CAST(mn.dk AS DOUBLE)) AS DECIMAL(18,9)) * 1000000)
        |         AS BIGINT) AS l_micro
        |  FROM top CROSS JOIN mn),
        |agg AS (SELECT sum(l_micro) AS sl FROM lt)
        |SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
        |       CAST((SELECT max(d) FROM deg) AS BIGINT) AS max_degree,
        |       CAST(mn.tk AS BIGINT) AS tail_k,
        |       CAST(CASE WHEN agg.sl > 0 THEN floor(
        |         (1000.0 * CAST(mn.tk AS DOUBLE) * 1000000.0)
        |         / CAST(agg.sl AS DOUBLE)) END AS BIGINT) AS alpha_milli
        |FROM mn CROSS JOIN agg
        |""".stripMargin)) { (s, dir) =>
      val deg = copurchaseEdges(s, dir)
        .select(explode(array(col("pa"), col("pb"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("d"))
        .materialize() // degree dim feeds counts, max, and the tail
      val stats = deg.agg(count(lit(1)).as("n_nodes"),
        max(col("d")).as("max_degree"))
      val top = deg.orderBy(col("d").desc, col("node")).limit(k)
        .select(col("d"))
      val mn = top.agg(min(col("d")).as("dk"), count(lit(1)).as("tk"))
      val agg = top.crossJoin(broadcast(mn))
        .select(expr("CAST(floor(CAST(ln(CAST(d AS DOUBLE) " +
          "/ CAST(dk AS DOUBLE)) AS DECIMAL(18,9)) * 1000000) " +
          "AS BIGINT)").as("l_micro"))
        .agg(sum(col("l_micro")).as("sl"))
      stats.crossJoin(broadcast(mn)).crossJoin(broadcast(agg))
        .select(col("n_nodes"), col("max_degree"),
          col("tk").cast("long").as("tail_k"),
          expr("CAST(CASE WHEN sl > 0 THEN floor(" +
            "(1000.0 * CAST(tk AS DOUBLE) * 1000000.0) " +
            "/ CAST(sl AS DOUBLE)) END AS BIGINT)").as("alpha_milli"))
    }
  }

  /** Event-type co-occurrence lift at the USER grain: do users who do
    * X also do Y (vs independence) — the behavioral-affinity matrix
    * q125's temporal transitions don't capture. User-type membership
    * is one distinct aggregate; the pair lift runs on the ≤types² dim
    * via a self-join of per-type user sets. */
  def q376: Q = Q(
    "q376_type_cooccurrence_lift",
    Some("""
      |WITH m AS (SELECT DISTINCT user_id, event_type FROM events),
      |n AS (SELECT count(DISTINCT user_id) AS n FROM events),
      |t AS (SELECT event_type, count(*) AS nt FROM m GROUP BY 1),
      |p AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |         count(*) AS n_both
      |  FROM m a JOIN m b ON a.user_id = b.user_id
      |       AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT p.type_a, p.type_b, CAST(p.n_both AS BIGINT) AS n_both,
      |       CAST((1000000 * p.n_both * n.n) // (ta.nt * tb.nt)
      |            AS BIGINT) AS lift_ppm
      |FROM p JOIN t ta ON p.type_a = ta.event_type
      |       JOIN t tb ON p.type_b = tb.event_type CROSS JOIN n
      |ORDER BY type_a, type_b
      |""".stripMargin)) { (s, dir) =>
    val m = Tables.events(s, dir)
      .select(col("user_id"), col("event_type")).distinct()
      .materialize() // user×type dim feeds margins AND both pair legs
    val n = Tables.events(s, dir)
      .agg(countDistinct(col("user_id")).as("n"))
    val t = m.groupBy(col("event_type")).agg(count(lit(1)).as("nt"))
    m.join(m.select(col("user_id").as("__bu"),
        col("event_type").as("type_b")),
        col("user_id") === col("__bu") &&
          col("event_type") < col("type_b"))
      .groupBy(col("event_type").as("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_both"))
      .join(broadcast(t.select(col("event_type").as("type_a"),
        col("nt").as("na"))), Seq("type_a"))
      .join(broadcast(t.select(col("event_type").as("type_b"),
        col("nt").as("nb"))), Seq("type_b"))
      .crossJoin(broadcast(n))
      .select(col("type_a"), col("type_b"), col("n_both"),
        expr("(1000000 * n_both * n) div (na * nb)").as("lift_ppm"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Session conversion rate by entry event type — q336's bounce face
    * flipped to the positive outcome: of sessions entered through X,
    * how many contain a purchase. Same 30-minute sessionization; the
    * conversion flag is one more session-partitioned window max. */
  def q365: Q = Q(
    "q365_session_conversion_by_entry",
    Some(s"""
      |WITH $sqlSessionCtes,
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id, grp
      |           ORDER BY t, event_id) AS rn,
      |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY user_id, grp) AS conv
      |  FROM g)
      |SELECT event_type AS entry_type,
      |       CAST(count(*) AS BIGINT) AS n_sessions,
      |       CAST(sum(conv) AS BIGINT) AS n_converted,
      |       CAST((1000000 * sum(conv)) // count(*) AS BIGINT)
      |         AS conv_ppm
      |FROM r WHERE rn = 1 GROUP BY 1 ORDER BY 1
      |""".stripMargin)) { (s, dir) =>
    val g = sessionized(s, dir)
    val wSess = Window.partitionBy(col("user_id"), col("grp"))
    g.withColumn("rn", row_number().over(
        wSess.orderBy(col("ts"), col("event_id"))))
      .withColumn("conv", max(when(col("event_type") === "purchase", 1)
        .otherwise(0)).over(wSess))
      .where(col("rn") === 1)
      .groupBy(col("event_type").as("entry_type"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("conv")).as("n_converted"))
      .select(col("entry_type"), col("n_sessions"), col("n_converted"),
        expr("(1000000 * n_converted) div n_sessions").as("conv_ppm"))
      .orderBy(col("entry_type"))
  }

  /** Day-of-week seasonal strength of daily revenue: 1 −
    * SS_resid/SS_total with group means milli-quantized FIRST (so
    * every squared deviation is an exact integer; the squares ride
    * DECIMAL/HUGEINT), plus the peak and trough weekdays. The day dim
    * is bounded; one fact aggregate feeds everything. */
  def q356: Q = Q(
    "q356_dow_seasonal_strength",
    Some("""
      |WITH dr AS (
      |  SELECT epoch_us(l_shipdate) // 86400000000 AS d,
      |         sum(CAST(l_extendedprice * 100 AS HUGEINT)) AS r
      |  FROM lineitem GROUP BY 1),
      |w AS (SELECT (d + 4) % 7 AS dow, r FROM dr),
      |t AS (SELECT count(*) AS n, (1000 * sum(r)) // count(*) AS tm
      |      FROM w),
      |g AS (
      |  SELECT dow, (1000 * sum(r)) // count(*) AS gm
      |  FROM w GROUP BY 1),
      |dev AS (
      |  SELECT CAST(1000 * w.r - t.tm AS HUGEINT) AS dt,
      |         CAST(1000 * w.r - g.gm AS HUGEINT) AS dg
      |  FROM w JOIN g USING (dow) CROSS JOIN t),
      |ss AS (SELECT sum(dt * dt) AS sst, sum(dg * dg) AS ssr FROM dev),
      |pk AS (
      |  SELECT max(CASE WHEN rn_hi = 1 THEN dow END) AS peak_dow,
      |         max(CASE WHEN rn_lo = 1 THEN dow END) AS trough_dow
      |  FROM (SELECT dow,
      |          row_number() OVER (ORDER BY gm DESC, dow) AS rn_hi,
      |          row_number() OVER (ORDER BY gm ASC, dow) AS rn_lo
      |        FROM g))
      |SELECT CAST(t.n AS BIGINT) AS n_days,
      |       CAST(1000000 - (1000000 * ss.ssr) // ss.sst AS BIGINT)
      |         AS strength_ppm,
      |       CAST(pk.peak_dow AS BIGINT) AS peak_dow,
      |       CAST(pk.trough_dow AS BIGINT) AS trough_dow
      |FROM t CROSS JOIN ss CROSS JOIN pk
      |""".stripMargin)) { (s, dir) =>
    val d38 = "decimal(38,0)"
    val w = Tables.lineitem(s, dir)
      .groupBy(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) " +
        "div 86400000000").as("d"))
      .agg(sum((col("l_extendedprice") * 100).cast(d38))
        .cast("long").as("r"))
      .select(expr("(d + 4) % 7").as("dow"), col("r"))
      .materialize() // day dim feeds the global, dow, and dev passes
    val t = w.agg(count(lit(1)).as("n"),
      expr("(1000 * sum(r)) div count(1)").as("tm"))
    val g = w.groupBy(col("dow"))
      .agg(expr("(1000 * sum(r)) div count(1)").as("gm"))
      .materialize() // 7-row dim: dev join + peak ranks
    val ss = w.join(broadcast(g), Seq("dow")).crossJoin(broadcast(t))
      .select((lit(1000) * col("r") - col("tm")).cast(d38).as("dt"),
        (lit(1000) * col("r") - col("gm")).cast(d38).as("dg"))
      .agg(sum(col("dt") * col("dt")).cast(d38).as("sst"),
        sum(col("dg") * col("dg")).cast(d38).as("ssr"))
    val pk = g
      .withColumn("rn_hi", row_number().over(
        Window.orderBy(col("gm").desc, col("dow"))))
      .withColumn("rn_lo", row_number().over(
        Window.orderBy(col("gm").asc, col("dow"))))
      .agg(max(when(col("rn_hi") === 1, col("dow"))).as("peak_dow"),
        max(when(col("rn_lo") === 1, col("dow"))).as("trough_dow"))
    t.crossJoin(broadcast(ss)).crossJoin(broadcast(pk))
      .select(col("n").as("n_days"),
        expr("CAST(1000000 - (1000000 * ssr) div sst AS BIGINT)")
          .as("strength_ppm"),
        col("peak_dow").cast("long").as("peak_dow"),
        col("trough_dow").cast("long").as("trough_dow"))
  }

  /** Kaplan-Meier survival curve of user lifetimes (first→last active
    * day; users still active on the corpus's final day are censored):
    * S ← (S·(n_t − d_t)) div n_t folded over event times in EXACT
    * integer micro units — the sequential product runs as an
    * OrderedFold over the bounded lifetime dim, and the oracle replays
    * it with a recursive CTE (identical integer ops, identical
    * order). */
  def q357: Q = Q(
    "q357_kaplan_meier",
    Some("""
      |WITH RECURSIVE a AS (
      |  SELECT user_id,
      |         min(epoch_ns(ts) // 86400000000000) AS f,
      |         max(epoch_ns(ts) // 86400000000000) AS l
      |  FROM events GROUP BY 1),
      |mx AS (SELECT max(l) AS maxd FROM a),
      |u AS (
      |  SELECT l - f AS t,
      |         CASE WHEN l = mx.maxd THEN 1 ELSE 0 END AS cens
      |  FROM a CROSS JOIN mx),
      |tt AS (
      |  SELECT t, count(*) AS m, count(*) FILTER (cens = 0) AS d
      |  FROM u GROUP BY t),
      |r AS (
      |  SELECT t, d,
      |         sum(m) OVER (ORDER BY t
      |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n
      |  FROM tt),
      |er AS (
      |  SELECT t, d, n, row_number() OVER (ORDER BY t) AS i
      |  FROM r WHERE d > 0),
      |km(i, t, d, n, s) AS (
      |  SELECT i, t, d, n, (1000000 * (n - d)) // n FROM er WHERE i = 1
      |  UNION ALL
      |  SELECT er.i, er.t, er.d, er.n, (km.s * (er.n - er.d)) // er.n
      |  FROM km JOIN er ON er.i = km.i + 1)
      |SELECT CAST(t AS BIGINT) AS t_days,
      |       CAST(n AS BIGINT) AS n_at_risk,
      |       CAST(d AS BIGINT) AS churned,
      |       CAST(s AS BIGINT) AS s_micro
      |FROM km ORDER BY t_days
      |""".stripMargin)) { (s, dir) =>
    import org.apache.spark.sql.types._
    val a = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(min(expr("ts div 86400000000000")).as("f"),
        max(expr("ts div 86400000000000")).as("l"))
    val mx = a.agg(max(col("l")).as("maxd"))
    val tt = a.crossJoin(broadcast(mx))
      .select((col("l") - col("f")).as("t"),
        when(col("l") === col("maxd"), 1).otherwise(0).as("cens"))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("m"),
        count(when(col("cens") === 0, 1)).as("d"))
    val er = tt.withColumn("n", sum(col("m")).over(
        Window.orderBy(col("t")) // lifetime dim, bounded
          .rowsBetween(0, Window.unboundedFollowing)))
      .where(col("d") > 0)
      .select(lit(0L).as("g"), col("t"), col("d"), col("n"))
    val out = StructType(Seq(
      StructField("t_days", LongType, nullable = false),
      StructField("n_at_risk", LongType, nullable = false),
      StructField("churned", LongType, nullable = false),
      StructField("s_micro", LongType, nullable = false)))
    // state: running S plus the emitted steps (lifetime dim ≤ days
    // span — bounded, documented)
    graft.operators.OrderedFold
      .foldGroups[(Long, List[(Long, Long, Long, Long)])](
        er, Seq("g"), Seq(col("t")), out)(
      init = _ => (1000000L, Nil),
      step = { case ((sRun, acc), row) =>
        val (t, d, n) = (row.getLong(1), row.getLong(2), row.getLong(3))
        val s2 = sRun * (n - d) / n
        (s2, (t, n, d, s2) :: acc)
      },
      emit = (_, st) => st._2.reverse.iterator.map {
        case (t, n, d, sm) =>
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](t, n, d, sm))
      })
      .orderBy(col("t_days"))
  }

  /** Return-hazard curve: for each inter-activity gap length k (days
    * between a user's consecutive active days), the hazard
    * P(returned after exactly k | away ≥ k) — the churn-model input
    * q269's half-life summarizes. The gap dim is tiny; the ≥k tail is
    * a reverse cumulative sum over it. */
  def q348: Q = Q(
    "q348_return_hazard",
    Some("""
      |WITH a AS (
      |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS d
      |  FROM events),
      |g AS (
      |  SELECT d - lag(d) OVER (PARTITION BY user_id ORDER BY d) AS gap
      |  FROM a),
      |h AS (SELECT gap, count(*) AS n_eq FROM g
      |      WHERE gap IS NOT NULL GROUP BY 1),
      |c AS (
      |  SELECT gap, n_eq,
      |         sum(n_eq) OVER (ORDER BY gap
      |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |           AS n_ge
      |  FROM h)
      |SELECT CAST(gap AS BIGINT) AS gap_days,
      |       CAST(n_eq AS BIGINT) AS n_returns,
      |       CAST(n_ge AS BIGINT) AS n_at_risk,
      |       CAST((1000000 * n_eq) // n_ge AS BIGINT) AS hazard_ppm
      |FROM c ORDER BY gap_days
      |""".stripMargin)) { (s, dir) =>
    val a = Tables.events(s, dir)
      .select(col("user_id"), expr("ts div 86400000000000").as("d"))
      .distinct()
    val g = a.withColumn("gap", col("d") - lag(col("d"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("d"))))
      .where(col("gap").isNotNull)
      .groupBy(col("gap")).agg(count(lit(1)).as("n_eq"))
    g.withColumn("n_ge", sum(col("n_eq")).over(
        Window.orderBy(col("gap")) // gap dim, bounded
          .rowsBetween(0, Window.unboundedFollowing)))
      .select(col("gap").as("gap_days"), col("n_eq").as("n_returns"),
        col("n_ge").as("n_at_risk"),
        expr("(1000000 * n_eq) div n_ge").as("hazard_ppm"))
      .orderBy(col("gap_days"))
  }

  /** Two-sample Kolmogorov-Smirnov statistic between the purchase and
    * click value distributions — "do the two event types draw from the
    * same spend distribution" (q301's Mann-Whitney is the rank test;
    * KS is the shape test). Entirely on the distinct-VALUE dim with
    * cross-multiplied integer ECDFs (|F1−F2| compared as
    * |c1·n2 − c2·n1|, no double ever ranks), the q301 discipline. */
  def q345: Q = Q(
    "q345_ks_value_test",
    Some("""
      |WITH v AS (
      |  SELECT value,
      |         count(*) FILTER (event_type = 'purchase') AS c1,
      |         count(*) FILTER (event_type = 'click') AS c2
      |  FROM events WHERE event_type IN ('purchase', 'click')
      |  GROUP BY value),
      |t AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM v),
      |cum AS (
      |  SELECT value,
      |         sum(c1) OVER (ORDER BY value) AS f1,
      |         sum(c2) OVER (ORDER BY value) AS f2
      |  FROM v),
      |d AS (
      |  SELECT cum.value, abs(f1 * t.n2 - f2 * t.n1) AS diff, t.n1, t.n2,
      |         row_number() OVER (
      |           ORDER BY abs(f1 * t.n2 - f2 * t.n1) DESC, cum.value) AS rn
      |  FROM cum CROSS JOIN t)
      |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |       CAST((1000000 * diff) // (n1 * n2) AS BIGINT) AS ks_ppm,
      |       CAST(CAST(value * 100 AS BIGINT) AS BIGINT) AS ks_at_cents
      |FROM d WHERE rn = 1
      |""".stripMargin)) { (s, dir) =>
    val v = Tables.events(s, dir)
      .where(col("event_type").isin("purchase", "click"))
      .groupBy(col("value"))
      .agg(count(when(col("event_type") === "purchase", 1)).as("c1"),
        count(when(col("event_type") === "click", 1)).as("c2"))
      .materialize() // distinct-value dim feeds the totals AND the ECDF
    val t = v.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    // the distinct-value dim GROWS with the event log (17,792 of 100k
    // events at sf0.1), so both ECDF running sums ride ONE
    // bucket-parallel globalRankCums pass ($8 value buckets — the value
    // model is range-bounded, so buckets stay balanced as data grows),
    // and the KS argmax is orderBy().limit(1), never a global window
    val cum = graft.dedup.SortedNeighborhood.globalRankCums(
        v.withColumn("__bkt", floor(col("value") / 8).cast("long")),
        idCol = "value", bucketCol = "__bkt", tieCols = Nil,
        cumCols = Seq("c1", "c2"))
      .select(col("value"), col("__cum_c1").as("f1"),
        col("__cum_c2").as("f2"))
    cum.crossJoin(broadcast(t))
      .withColumn("diff", abs(col("f1") * col("n2") - col("f2") * col("n1")))
      .orderBy(col("diff").desc, col("value"))
      .limit(1)
      .select(col("n1"), col("n2"),
        expr("(1000000 * diff) div (n1 * n2)").as("ks_ppm"),
        (col("value") * 100).cast("decimal(38,0)").cast("long")
          .as("ks_at_cents"))
  }

  /** Session bounce rate by entry event type: sessionize on 30-minute
    * inactivity gaps (q53's recipe with the (ts, event_id) tie-break),
    * take each session's FIRST event as the entry, and report how many
    * sessions never see a second event — "which front doors lose the
    * visit". All windows are user- or session-partitioned. */
  def q336: Q = Q(
    "q336_bounce_by_entry",
    Some(s"""
      |WITH $sqlSessionCtes,
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id, grp
      |           ORDER BY t, event_id) AS rn,
      |         count(*) OVER (PARTITION BY user_id, grp) AS n
      |  FROM g)
      |SELECT event_type AS entry_type,
      |       CAST(count(*) AS BIGINT) AS n_sessions,
      |       CAST(count(*) FILTER (n = 1) AS BIGINT) AS n_bounce,
      |       CAST((1000000 * count(*) FILTER (n = 1)) // count(*)
      |            AS BIGINT) AS bounce_ppm
      |FROM r WHERE rn = 1 GROUP BY 1 ORDER BY 1
      |""".stripMargin)) { (s, dir) =>
    val g = sessionized(s, dir)
    val wSess = Window.partitionBy(col("user_id"), col("grp"))
    g.withColumn("rn", row_number().over(
        wSess.orderBy(col("ts"), col("event_id"))))
      .withColumn("n", count(lit(1)).over(wSess))
      .where(col("rn") === 1)
      .groupBy(col("event_type").as("entry_type"))
      .agg(count(lit(1)).as("n_sessions"),
        count(when(col("n") === 1, 1)).as("n_bounce"))
      .select(col("entry_type"), col("n_sessions"), col("n_bounce"),
        expr("(1000000 * n_bounce) div n_sessions").as("bounce_ppm"))
      .orderBy(col("entry_type"))
  }

  /** Markov stationary estimate of the event-type chain: row-normalize
    * q125's transition counts to milli probabilities, power-iterate a
    * uniform start THREE fixed rounds in scaled integers (q99/q186
    * discipline — every step is `(Σ p·T) div 1000`, exact in both
    * engines), and set the result against the observed type share.
    * Everything after the one fact aggregate is a ≤k² dim. */
  def q337: Q = {
    val iterCtes = (1 to 3).map { i =>
      s"""p$i AS (
         |  SELECT t.to_type AS state,
         |         sum(p.p_micro * t.t_milli) // 1000 AS p_micro
         |  FROM p${i - 1} p JOIN tm t ON p.state = t.from_type
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    Q("q337_markov_stationary",
      Some(s"""
        |WITH e AS (
        |  SELECT user_id, event_type, epoch_ns(ts) AS ns, event_id
        |  FROM events),
        |tr AS (
        |  SELECT event_type AS from_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ns, event_id) AS to_type
        |  FROM e),
        |c AS (
        |  SELECT from_type, to_type, count(*) AS n FROM tr
        |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |ot AS (SELECT from_type, sum(n) AS tot FROM c GROUP BY 1),
        |tm AS (
        |  SELECT c.from_type, c.to_type, (1000 * c.n) // ot.tot AS t_milli
        |  FROM c JOIN ot USING (from_type)),
        |k AS (SELECT count(*) AS k FROM ot),
        |p0 AS (
        |  SELECT from_type AS state, 1000000 // k.k AS p_micro
        |  FROM ot CROSS JOIN k),
        |$iterCtes,
        |obs AS (
        |  SELECT from_type AS state,
        |         (1000000 * tot) // (SELECT sum(tot) FROM ot) AS obs_micro
        |  FROM ot)
        |SELECT p3.state, CAST(p3.p_micro AS BIGINT) AS p3_micro,
        |       CAST(obs.obs_micro AS BIGINT) AS obs_micro
        |FROM p3 JOIN obs USING (state) ORDER BY state
        |""".stripMargin)) { (s, dir) =>
      val c = graft.operators.Funnel.transitions(Tables.events(s, dir),
          "user_id", "event_type", "ts", "event_id")
        .where(col("to_type") =!= "(end)")
        .materialize() // k²-row dim feeds totals + 3 iterations
      val ot = c.groupBy(col("from_type"))
        .agg(sum(col("n_transitions")).as("tot"))
        .materialize()
      val tm = c.join(broadcast(ot), Seq("from_type"))
        .select(col("from_type"), col("to_type"),
          expr("(1000 * n_transitions) div tot").as("t_milli"))
      val k = ot.agg(count(lit(1)).as("k"))
      var p = ot.crossJoin(broadcast(k))
        .select(col("from_type").as("state"),
          expr("1000000 div k").as("p_micro"))
      for (_ <- 1 to 3)
        p = p.join(broadcast(tm), col("state") === col("from_type"))
          .groupBy(col("to_type"))
          .agg(expr("sum(p_micro * t_milli) div 1000").as("p_next"))
          .select(col("to_type").as("state"), col("p_next").as("p_micro"))
      val tot = ot.agg(sum(col("tot")).as("all_tot"))
      val obs = ot.crossJoin(broadcast(tot))
        .select(col("from_type").as("state"),
          expr("(1000000 * tot) div all_tot").as("obs_micro"))
      p.join(broadcast(obs), Seq("state"))
        .select(col("state"), col("p_micro").as("p3_micro"),
          col("obs_micro"))
        .orderBy(col("state"))
    }
  }

  /** U-shaped (40/20/40 position) attribution per channel — the model
    * that rewards discovery AND closing, set beside q171 (last-touch),
    * q203 (linear) and q239 (disagreement). Exact integer micro
    * credits end to end (Attribution.uShapedTouch); the oracle replays
    * the same position CASE. */
  def q339: Q = {
    val lookback = 48L * 3600L * 1000000000L
    Q("q339_ushaped_attribution",
      Some(s"""
        |WITH c AS (
        |  SELECT user_id AS e, epoch_ns(ts) AS cts, event_id AS cid
        |  FROM events
        |  WHERE event_type = 'purchase' AND user_id IS NOT NULL),
        |t AS (
        |  SELECT user_id AS e, epoch_ns(ts) AS tts, event_id AS tid,
        |         event_type AS channel
        |  FROM events WHERE event_type IN ('click', 'view', 'signup')),
        |elig AS (
        |  SELECT cid, channel, tts, tid FROM c JOIN t USING (e)
        |  WHERE (tts < cts OR (tts = cts AND tid < cid))
        |    AND cts - tts <= $lookback),
        |pos AS (
        |  SELECT cid, channel,
        |         row_number() OVER (PARTITION BY cid ORDER BY tts, tid)
        |           AS rn,
        |         count(*) OVER (PARTITION BY cid) AS m
        |  FROM elig),
        |cr AS (
        |  SELECT cid, channel,
        |         CASE WHEN m = 1 THEN 1000000
        |              WHEN m = 2 THEN 500000
        |              WHEN rn = 1 OR rn = m THEN 400000
        |              ELSE 200000 // (m - 2) END AS credit_micro
        |  FROM pos),
        |un AS (
        |  SELECT c.cid, '(none)' AS channel, 1000000 AS credit_micro
        |  FROM c LEFT JOIN cr ON c.cid = cr.cid WHERE cr.cid IS NULL)
        |SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
        |       CAST(sum(credit_micro) AS BIGINT) AS credit_micro_sum
        |FROM (SELECT channel, credit_micro FROM cr
        |      UNION ALL SELECT channel, credit_micro FROM un)
        |GROUP BY channel ORDER BY channel
        |""".stripMargin)) { (s, dir) =>
      graft.operators.Attribution.uShapedTouch(Tables.events(s, dir),
          "user_id", "ts", "event_id", "event_type",
          convType = "purchase",
          touchTypes = Seq("click", "view", "signup"),
          lookback = lookback)
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_touches"),
          sum(col("credit_micro")).as("credit_micro_sum"))
        .orderBy(col("channel"))
    }
  }

  /** Holt double-exponential smoothing (α=0.3, β=0.2) of year-2000
    * daily revenue, with the one-step-ahead forecast: the level/trend
    * fold runs as an OrderedFold (secondary-sorted, one pass), the
    * oracle replays the IDENTICAL IEEE op sequence via list_reduce
    * (q15/q21 discipline: l′ = 0.3·x + 0.7·(l+b) then b′ =
    * 0.2·(l′−l) + 0.8·b, inlined in the lambda), and only the THREE
    * final scalars are DECIMAL-quantized. */
  def q340: Q = {
    // b' inlines l' — same ops, same operand order as the Scala fold
    val lExpr = "0.3 * e[1].l + 0.7 * (acc[1].l + acc[1].b)"
    Q("q340_holt_daily_revenue",
      Some(s"""
        |WITH dr AS (
        |  SELECT epoch_us(l_shipdate) // 86400000000 AS d,
        |         sum(CAST(l_extendedprice * 100 AS HUGEINT)) AS r
        |  FROM lineitem WHERE year(l_shipdate) = 2000 GROUP BY 1),
        |v AS (SELECT list(CAST(r AS DOUBLE) ORDER BY d) AS vals,
        |             count(*) AS n FROM dr),
        |f AS (
        |  SELECT n, list_reduce(
        |    list_prepend([{'l': vals[1], 'b': CAST(0.0 AS DOUBLE)}],
        |      list_transform(vals[2:],
        |        x -> [{'l': x, 'b': CAST(0.0 AS DOUBLE)}])),
        |    (acc, e) -> [{'l': $lExpr,
        |                  'b': 0.2 * (($lExpr) - acc[1].l)
        |                       + 0.8 * acc[1].b}]) AS st
        |  FROM v)
        |SELECT CAST(n AS BIGINT) AS n_days,
        |       CAST(floor(CAST(st[1].l AS DECIMAL(28,6)) * 1000)
        |            AS BIGINT) AS level_milli,
        |       CAST(floor(CAST(st[1].b AS DECIMAL(28,6)) * 1000)
        |            AS BIGINT) AS trend_milli,
        |       CAST(floor(CAST(st[1].l + st[1].b AS DECIMAL(28,6)) * 1000)
        |            AS BIGINT) AS forecast_milli
        |FROM f
        |""".stripMargin)) { (s, dir) =>
      import org.apache.spark.sql.types._
      val dr = Tables.lineitem(s, dir)
        .where(year(col("l_shipdate")) === 2000)
        .groupBy(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) " +
          "div 86400000000").as("d"))
        .agg(sum((col("l_extendedprice") * 100).cast("decimal(38,0)"))
          .cast("long").as("r"))
        .select(lit(0L).as("g"), col("d"), col("r"))
      val out = StructType(Seq(
        StructField("n_days", LongType, nullable = false),
        StructField("level", DoubleType, nullable = false),
        StructField("trend", DoubleType, nullable = false)))
      // state: (level, trend, count); first row seeds (x, 0)
      graft.operators.OrderedFold.foldGroups[(Double, Double, Long)](
        dr, Seq("g"), Seq(col("d")), out)(
        init = _ => (0.0, 0.0, 0L),
        step = { case ((l, b, n), row) =>
          val x = row.getLong(2).toDouble
          if (n == 0L) (x, 0.0, 1L)
          else {
            val l2 = 0.3 * x + 0.7 * (l + b)
            val b2 = 0.2 * (l2 - l) + 0.8 * b
            (l2, b2, n + 1)
          }
        },
        emit = (_, st) => Iterator(
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](st._3, st._1, st._2))))
        .select(col("n_days"),
          expr("CAST(floor(CAST(level AS DECIMAL(28,6)) * 1000) " +
            "AS BIGINT)").as("level_milli"),
          expr("CAST(floor(CAST(trend AS DECIMAL(28,6)) * 1000) " +
            "AS BIGINT)").as("trend_milli"),
          expr("CAST(floor(CAST(level + trend AS DECIMAL(28,6)) * 1000) " +
            "AS BIGINT)").as("forecast_milli"))
    }
  }

  /** Co-purchase triangle census: parts are nodes, "co-ordered in ≥2
    * distinct orders" the edges (the A-priori support prune keeps the
    * pair fan-out order-bounded, q169's discipline), then the global
    * triangle/wedge counts and clustering coefficient. The edge dim is
    * support-pruned (3.4k rows at sf0.01) so the 3-way triangle join
    * broadcasts; nothing fact-sized survives the first aggregate. */
  def q326: Q = Q(
    "q326_copurchase_triangles",
    Some(s"""
      |WITH $sqlCopurchaseEdgeCtes,
      |deg AS (
      |  SELECT node, count(*) AS d
      |  FROM (SELECT pa AS node FROM e UNION ALL SELECT pb FROM e)
      |  GROUP BY 1),
      |w AS (
      |  SELECT count(*) AS n_nodes, sum((d * (d - 1)) // 2) AS wedges
      |  FROM deg),
      |t AS (
      |  SELECT count(*) AS tri
      |  FROM e e1 JOIN e e2 ON e1.pb = e2.pa
      |       JOIN e e3 ON e1.pa = e3.pa AND e2.pb = e3.pb)
      |SELECT CAST(w.n_nodes AS BIGINT) AS n_nodes,
      |       CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
      |       CAST(w.wedges AS BIGINT) AS wedges,
      |       CAST(t.tri AS BIGINT) AS n_triangles,
      |       CAST(CASE WHEN w.wedges = 0 THEN 0
      |            ELSE (3000 * t.tri) // w.wedges END AS BIGINT)
      |         AS clustering_milli
      |FROM w CROSS JOIN t
      |""".stripMargin)) { (s, dir) =>
    val e = copurchaseEdges(s, dir) // degree, count, 3 triangle legs
    val deg = e.select(col("pa").as("node"))
      .unionAll(e.select(col("pb").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    val w = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("(d * (d - 1)) div 2")).as("wedges"))
    val ne = e.agg(count(lit(1)).as("n_edges"))
    val tri = e.select(col("pa").as("a1"), col("pb").as("b1"))
      .join(broadcast(e.select(col("pa").as("a2"), col("pb").as("b2"))),
        col("b1") === col("a2"))
      .join(broadcast(e.select(col("pa").as("a3"), col("pb").as("b3"))),
        col("a1") === col("a3") && col("b2") === col("b3"))
      .agg(count(lit(1)).as("tri"))
    w.crossJoin(broadcast(ne)).crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("wedges"),
        col("tri").as("n_triangles"),
        expr("CAST(CASE WHEN wedges = 0 THEN 0 " +
          "ELSE (3000 * tri) div wedges END AS BIGINT)")
          .as("clustering_milli"))
  }

  /** Theil-Sen robust trend of year-2000 daily revenue: the slope
    * quartiles over ALL day pairs (median = the Theil-Sen estimator,
    * p250/p750 its spread). Pairs are a day-dim cross (366² / 2 — a
    * bounded dim square, never fact-sized); each slope is one pinned
    * IEEE divide then floor-micro. */
  def q327: Q = Q(
    "q327_theil_sen_slope",
    Some("""
      |WITH dr AS (
      |  SELECT epoch_us(l_shipdate) // 86400000000 AS d,
      |         sum(CAST(l_extendedprice * 100 AS HUGEINT)) AS r
      |  FROM lineitem WHERE year(l_shipdate) = 2000 GROUP BY 1),
      |p AS (
      |  SELECT CAST(floor((1000000.0 * CAST(b.r - a.r AS DOUBLE))
      |                    / CAST(nullif(b.d - a.d, 0) AS DOUBLE))
      |              AS BIGINT) AS s
      |  FROM dr a JOIN dr b ON a.d < b.d),
      |r AS (
      |  SELECT s, row_number() OVER (ORDER BY s) AS rn,
      |         count(*) OVER () AS n
      |  FROM p)
      |SELECT 'slope_micro' AS stat, CAST(pm.p AS INTEGER) AS permille,
      |       r.s AS value
      |FROM r JOIN (VALUES (250), (500), (750)) pm(p)
      |  ON r.rn = (pm.p * r.n + 999) // 1000
      |ORDER BY permille
      |""".stripMargin)) { (s, dir) =>
    val dr = Tables.lineitem(s, dir)
      .where(year(col("l_shipdate")) === 2000)
      .groupBy(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) " +
        "div 86400000000").as("d"))
      .agg(sum((col("l_extendedprice") * 100).cast("decimal(38,0)"))
        .cast("long").as("r"))
    val drm = dr.materialize() // day dim used as both pair legs
    val pairs = drm.select(col("d").as("d1"), col("r").as("r1"))
      .join(drm.select(col("d").as("d2"), col("r").as("r2")),
        col("d1") < col("d2"))
      // nullif keeps the expression total: the null-filter conjunct can
      // be evaluated BEFORE d1<d2 once pushed into the join condition,
      // and ANSI double division by zero throws
      .select(expr("CAST(floor((1000000.0 * CAST(r2 - r1 AS DOUBLE)) " +
        "/ CAST(nullif(d2 - d1, 0) AS DOUBLE)) AS BIGINT)").as("s"),
        lit("slope_micro").as("stat"))
    graft.operators.OrderStats
      .quantilesDisc(pairs, Seq("stat"), "s", Seq(250, 500, 750))
      .orderBy(col("permille"))
  }

  /** Longest consecutive-day purchase streak per user, as a histogram
    * (streak length → users whose MAX streak is that long) — the
    * habit-formation curve. Classic gaps-and-islands: day −
    * row_number() is constant exactly on consecutive runs; every
    * window is user-partitioned. */
  def q328: Q = Q(
    "q328_purchase_streaks",
    Some("""
      |WITH a AS (
      |  SELECT DISTINCT user_id,
      |         epoch_ns(ts) // 86400000000000 AS d
      |  FROM events WHERE event_type = 'purchase'),
      |g AS (
      |  SELECT user_id,
      |         d - row_number() OVER (PARTITION BY user_id ORDER BY d)
      |           AS grp
      |  FROM a),
      |st AS (SELECT user_id, count(*) AS len FROM g GROUP BY user_id, grp),
      |m AS (SELECT user_id, max(len) AS ml FROM st GROUP BY 1)
      |SELECT CAST(ml AS BIGINT) AS streak_days,
      |       CAST(count(*) AS BIGINT) AS n_users
      |FROM m GROUP BY 1 ORDER BY 1
      |""".stripMargin)) { (s, dir) =>
    val a = Tables.events(s, dir)
      .where(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts div 86400000000000").as("d"))
      .distinct()
    a.withColumn("grp", col("d") - row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("d"))))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id")).agg(max(col("len")).as("ml"))
      .groupBy(col("ml").as("streak_days"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("streak_days"))
  }

  /** Wald-Wolfowitz runs test on year-2000 daily revenue deltas: are
    * up/down days random, or does demand trend? Counts are exact
    * integers; the z statistic is ONE shared double expression
    * (identical op order both engines) floor-micro-quantized. The only
    * ordered window runs over the ≤366-row day dim. */
  def q329: Q = {
    // same text both engines: doubles from integer counts, pinned order
    val zExpr =
      "CAST(floor(CAST((CAST(n_runs AS DOUBLE) - (1.0 + " +
        "(2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)) " +
        "/ CAST(n_signs AS DOUBLE))) / sqrt(" +
        "(2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE) " +
        "* (2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE) " +
        "- CAST(n_signs AS DOUBLE))) / (CAST(n_signs AS DOUBLE) " +
        "* CAST(n_signs AS DOUBLE) * (CAST(n_signs AS DOUBLE) - 1.0))" +
        ") AS DECIMAL(18,9)) * 1000000) AS BIGINT)"
    Q("q329_revenue_runs_test",
      Some(s"""
        |WITH dr AS (
        |  SELECT epoch_us(l_shipdate) // 86400000000 AS d,
        |         sum(CAST(l_extendedprice * 100 AS HUGEINT)) AS r
        |  FROM lineitem WHERE year(l_shipdate) = 2000 GROUP BY 1),
        |o AS (SELECT d, r, lag(r) OVER (ORDER BY d) AS pr FROM dr),
        |sg AS (
        |  SELECT d, CASE WHEN r > pr THEN 1 ELSE -1 END AS s
        |  FROM o WHERE pr IS NOT NULL AND r <> pr),
        |ch AS (SELECT d, s, lag(s) OVER (ORDER BY d) AS ps FROM sg),
        |c AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_signs,
        |         CAST(count(*) FILTER (s = 1) AS BIGINT) AS n_up,
        |         CAST(count(*) FILTER (s = -1) AS BIGINT) AS n_down,
        |         CAST(1 + count(*) FILTER (ps IS NOT NULL AND s <> ps)
        |              AS BIGINT) AS n_runs
        |  FROM ch)
        |SELECT n_signs, n_up, n_down, n_runs, $zExpr AS z_micro FROM c
        |""".stripMargin)) { (s, dir) =>
      val dr = Tables.lineitem(s, dir)
        .where(year(col("l_shipdate")) === 2000)
        .groupBy(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) " +
          "div 86400000000").as("d"))
        .agg(sum((col("l_extendedprice") * 100).cast("decimal(38,0)"))
          .cast("long").as("r"))
      val w = Window.orderBy(col("d")) // ≤366-row day dim
      dr.withColumn("pr", lag(col("r"), 1).over(w))
        .where(col("pr").isNotNull && col("r") =!= col("pr"))
        .select(col("d"),
          when(col("r") > col("pr"), lit(1)).otherwise(lit(-1)).as("s"))
        .withColumn("ps", lag(col("s"), 1).over(w))
        .agg(count(lit(1)).cast("long").as("n_signs"),
          count(when(col("s") === 1, 1)).cast("long").as("n_up"),
          count(when(col("s") === -1, 1)).cast("long").as("n_down"),
          (lit(1) + count(when(col("ps").isNotNull &&
            col("s") =!= col("ps"), 1))).cast("long").as("n_runs"))
        .select(col("n_signs"), col("n_up"), col("n_down"), col("n_runs"),
          expr(zExpr).as("z_micro"))
    }
  }

  /** Day-of-week × hour load heatmap with within-day shares and the
    * peak-hour flag — the capacity-planning face. Epoch-day dow
    * ((d+4) mod 7: 1970-01-01 was a Thursday) keeps both engines in
    * pure integer arithmetic; the peak is a per-dow top-1 window over
    * the ≤24-row hour dim. */
  def q330: Q = Q(
    "q330_dow_hour_heatmap",
    Some("""
      |WITH c AS (
      |  SELECT (epoch_ns(ts) // 86400000000000 + 4) % 7 AS dow,
      |         (epoch_ns(ts) % 86400000000000) // 3600000000000 AS hr,
      |         count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |t AS (SELECT dow, sum(n) AS tot FROM c GROUP BY 1),
      |r AS (
      |  SELECT c.dow, c.hr, c.n, (1000000 * c.n) // t.tot AS ppm,
      |         row_number() OVER (PARTITION BY c.dow
      |           ORDER BY c.n DESC, c.hr) AS rn
      |  FROM c JOIN t USING (dow))
      |SELECT CAST(dow AS BIGINT) AS dow, CAST(hr AS BIGINT) AS hr,
      |       CAST(n AS BIGINT) AS n_events,
      |       CAST(ppm AS BIGINT) AS share_ppm,
      |       CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_peak
      |FROM r ORDER BY dow, hr
      |""".stripMargin)) { (s, dir) =>
    val c = Tables.events(s, dir)
      .groupBy(expr("(ts div 86400000000000 + 4) % 7").as("dow"),
        expr("(ts % 86400000000000) div 3600000000000").as("hr"))
      .agg(count(lit(1)).as("n"))
      .materialize() // dow×hour dim feeds totals AND the rank pass
    val t = c.groupBy(col("dow")).agg(sum(col("n")).as("tot"))
    c.join(broadcast(t), Seq("dow"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("dow"))
          .orderBy(col("n").desc, col("hr"))))
      .select(col("dow"), col("hr"), col("n").as("n_events"),
        expr("(1000000 * n) div tot").as("share_ppm"),
        when(col("rn") === 1, lit(1L)).otherwise(lit(0L)).as("is_peak"))
      .orderBy(col("dow"), col("hr"))
  }
}
