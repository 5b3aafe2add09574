package graft.queries
import graft.Materialize.MatOps

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.AsOf

/** Extension operators beyond the reference's surface: as-of join and
  * approximate sketches.
  */
object ExtQueries {

  val all: Seq[Q] = Seq(q37, q38, q39, q40, q41, q42, q44, q48, q49, q50,
    q52, q53, q55, q56, q57, q89, q96)

  /** Session-concurrency pairs (RangeJoin.overlapJoin): which user
    * sessions were live at the same time — interval×interval overlap,
    * the shape that would otherwise be a nested-loop join. Sessions
    * come from q53's shared gap-sessionization fragment; the oracle is
    * the naive overlap join, so hash-equality proves the bucketed
    * exactly-once rewrite (first-shared-bucket keep rule) correct. */
  def q96: Q = Q(
    "q96_session_overlap",
    Some(s"""
      |WITH $sqlSessionCtes,
      |sess AS (
      |  SELECT user_id, min(t_us) AS s_us, max(t_us) + 1800000000 AS e_us
      |  FROM g53 GROUP BY user_id, grp)
      |SELECT a.user_id AS u1, a.s_us AS s1_us, b.user_id AS u2,
      |       b.s_us AS s2_us,
      |       least(a.e_us, b.e_us) - greatest(a.s_us, b.s_us) AS overlap_us
      |FROM sess a JOIN sess b
      |  ON a.user_id < b.user_id AND a.s_us <= b.e_us AND b.s_us <= a.e_us
      |ORDER BY u1, s1_us, u2, s2_us
      |""".stripMargin)) { (s, dir) =>
    import graft.operators.RangeJoin
    val sess = graft.streaming.EventStreams.sessionStats(Tables.events(s, dir))
      .select(col("user_id"),
        unix_micros(col("session_start")).as("s_us"),
        unix_micros(col("session_end")).as("e_us"))
      .materialize() // feeds both overlap sides — compute once
    val a = sess.select(col("user_id").as("u1"), col("s_us").as("s1_us"),
      col("e_us").as("e1_us"))
    val b = sess.select(col("user_id").as("u2"), col("s_us").as("s2_us"),
      col("e_us").as("e2_us"))
    RangeJoin.overlapJoin(a, "s1_us", "e1_us", b, "s2_us", "e2_us",
        bucketWidth = 3600000000L)
      .where(col("u1") < col("u2"))
      .select(col("u1"), col("s1_us"), col("u2"), col("s2_us"),
        (least(col("e1_us"), col("e2_us")) -
          greatest(col("s1_us"), col("s2_us"))).as("overlap_us"))
      .orderBy(col("u1"), col("s1_us"), col("u2"), col("s2_us"))
  }

  /** Bucketed interval join (RangeJoin.intervalJoin): incident windows
    * (±30 min around high-value error events) × ALL events by pure time
    * overlap — no equi key, the shape Spark would otherwise plan as a
    * BroadcastNestedLoopJoin. The oracle is the raw BETWEEN join; the
    * Spark side goes through bucket-explode + equi-join + residual
    * filter, so hash-equality proves the bucketed rewrite exact. */
  def q89: Q = {
    import org.apache.spark.sql.types.DecimalType
    Q("q89_range_join",
      Some("""
        |WITH ev AS (
        |  SELECT event_id, epoch_ns(ts) // 1000 AS t_us, event_type, value
        |  FROM events),
        |inc AS (
        |  SELECT event_id AS incident_id,
        |         t_us - 1800000000 AS s_us, t_us + 1800000000 AS e_us
        |  FROM ev WHERE event_type = 'error' AND value >= 180.0),
        |j AS (
        |  SELECT inc.incident_id, inc.s_us, inc.e_us, ev.value
        |  FROM inc JOIN ev ON ev.t_us BETWEEN inc.s_us AND inc.e_us)
        |SELECT incident_id, s_us, e_us, count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
        |FROM j GROUP BY 1, 2, 3 ORDER BY incident_id
        |""".stripMargin)) { (s, dir) =>
      val ev = Tables.events(s, dir).select(
        col("event_id"), expr("ts div 1000").as("t_us"),
        col("event_type"), col("value"))
      val inc = ev
        .where(col("event_type") === "error" && col("value") >= 180.0)
        .select(col("event_id").as("incident_id"),
          (col("t_us") - 1800000000L).as("s_us"),
          (col("t_us") + 1800000000L).as("e_us"))
      val facts = ev.select(col("event_id"), col("t_us"), col("value"))
      graft.operators.RangeJoin
        .intervalJoin(facts, "t_us", inc, "s_us", "e_us",
          bucketWidth = 3600000000L)
        .groupBy("incident_id", "s_us", "e_us")
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(28, 6))).cast("double")
            .as("total_value"))
        .orderBy(col("incident_id"))
    }
  }

  /** Sliding-window aggregation (EventStreams.slidingTypeStats): 1-hour
    * windows every 15 minutes — hour/quarter divide evenly, so each event
    * lands in exactly 4 windows; the oracle fans each event out with
    * unnest(range(0,4)) over exact integer microsecond arithmetic. */
  def q56: Q = Q(
    "q56_sliding_type_stats",
    Some("""
      |WITH e AS (
      |  SELECT epoch_ns(ts) // 1000 AS t_us, event_type, value FROM events),
      |w AS (
      |  SELECT ((t_us // 900000000) - u.i) * 900 AS window_start,
      |         event_type, value
      |  FROM e, unnest(range(0, 4)) AS u(i))
      |SELECT window_start, event_type, count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
      |FROM w GROUP BY 1, 2 ORDER BY 1, 2
      |""".stripMargin)) { (s, dir) =>
    graft.streaming.EventStreams.slidingTypeStats(Tables.events(s, dir))
      .select(
        col("window_start").cast("long").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))
      .orderBy(col("window_start"), col("event_type"))
  }

  /** Skew-safe two-phase salted aggregation (Relational.saltedCountSum)
    * over a DECIMAL-cast value column, so the two-phase merge is exact and
    * the direct-groupBy oracle matches hash-for-hash. event_type has few
    * distinct values — precisely the hot-key shape salting exists for. */
  def q57: Q = {
    import org.apache.spark.sql.types.DecimalType
    Q("q57_salted_skew_agg",
      Some("""
        |SELECT event_type, count(*) AS cnt,
        |       CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_v
        |FROM events GROUP BY event_type ORDER BY event_type
        |""".stripMargin)) { (s, dir) =>
      val ev = Tables.events(s, dir).select(
        col("event_type"), col("value").cast(DecimalType(28, 6)).as("v"))
      graft.operators.Relational.saltedCountSum(ev, Seq("event_type"), Seq("v"))
        .select(col("event_type"), col("cnt"), col("sum_v").cast("double").as("sum_v"))
        .orderBy(col("event_type"))
    }
  }

  /** Batch face of the streaming tumbling-hour aggregation
    * (graft.streaming.EventStreams.hourlyTypeStats) — the SAME transform
    * runs on readStream frames; MlAndStreamingSpec pins stream-vs-batch
    * equality, this entry pins the values against the oracle. Window
    * starts surface as epoch seconds (hour-aligned, so the cast is exact
    * on both engines). */
  def q52: Q = Q(
    "q52_hourly_type_stats",
    Some("""
      |SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS window_start,
      |       event_type, count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2
      |""".stripMargin)) { (s, dir) =>
    graft.streaming.EventStreams.hourlyTypeStats(Tables.events(s, dir))
      .select(
        col("window_start").cast("long").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))
      .orderBy(col("window_start"), col("event_type"))
  }

  /** Batch face of the gap-based session window
    * (EventStreams.sessionStats, 30-minute gap). Oracle replays Spark's
    * session semantics as islands-and-gaps SQL: a new session starts when
    * the gap to the previous event is >= the gap duration (Spark merges
    * sessions only while the next event falls strictly inside
    * last + gap), and session_end = last event + gap. Microsecond longs
    * on both sides — no timestamp comparisons across engines. */
  /** Gap-based sessionization CTE chain (e53/o53/g53) — 30-minute gaps,
    * session_end = last event + gap (Spark's built-in session_window
    * semantics). Shared by q53 (per-session stats) and q96 (session
    * concurrency) so the gap recipe exists once. */
  // def, not val: `all` at the top of the object evaluates q53/q96
  // during object init, BEFORE a later val would be assigned (the
  // "WITH null" trap)
  private def sqlSessionCtes: String =
    """e53 AS (
      |  SELECT user_id, epoch_ns(ts) // 1000 AS t_us, value FROM events),
      |o53 AS (
      |  SELECT *, lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us) AS prev
      |  FROM e53),
      |g53 AS (
      |  SELECT *, sum(CASE WHEN prev IS NULL OR t_us - prev >= 1800000000
      |                     THEN 1 ELSE 0 END)
      |              OVER (PARTITION BY user_id ORDER BY t_us
      |                    ROWS UNBOUNDED PRECEDING) AS grp
      |  FROM o53)""".stripMargin

  def q53: Q = Q(
    "q53_session_stats",
    Some(s"""
      |WITH $sqlSessionCtes
      |SELECT user_id,
      |       min(t_us) AS session_start_us,
      |       max(t_us) + 1800000000 AS session_end_us,
      |       count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
      |FROM g53 GROUP BY user_id, grp
      |ORDER BY user_id, session_start_us
      |""".stripMargin)) { (s, dir) =>
    graft.streaming.EventStreams.sessionStats(Tables.events(s, dir))
      .select(
        col("user_id"),
        unix_micros(col("session_start")).as("session_start_us"),
        unix_micros(col("session_end")).as("session_end_us"),
        col("n_events"), col("total_value"))
      .orderBy(col("user_id"), col("session_start_us"))
  }

  /** IVF approximate nearest neighbors (graft.sim.Similarity.ivfTopK):
    * rows-only by nature — the KMeans coarse quantizer is seed-stable but
    * floating-point-order sensitive, so no cross-engine oracle exists;
    * recall >= 0.9 vs brute force is pinned in PipelineOpsSpec. */
  def q55: Q = Q("q55_ivf_ann", None) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
    graft.sim.Similarity.ivfTopK(
      emb, emb.filter(col("vec_id") < 50), "vec_id", "embedding",
      k = 3, nlist = 16, nprobe = 3)
      .orderBy(col("vec_id"), col("rank"))
  }

  /** The native GroupedTopK operator (custom LogicalPlan → Strategy →
    * physical exec, graft.plans): per-supplier top-3 line items by price
    * with bounded heaps instead of a full per-partition sort. Oracle: the
    * equivalent row_number formulation — identical result set for the
    * total order used. */
  def q50: Q = Q(
    "q50_grouped_topk",
    Some("""
      |SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice
      |FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
      |         row_number() OVER (PARTITION BY l_suppkey
      |           ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      |  FROM lineitem)
      |WHERE rn <= 3
      |ORDER BY l_suppkey, l_extendedprice DESC, l_orderkey, l_linenumber
      |""".stripMargin)) { (s, dir) =>
    graft.plans.GroupedTopK.topKPerKey(
      Tables.lineitem(s, dir)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice"),
      keyCols = Seq("l_suppkey"),
      order = Seq("l_extendedprice" -> false, "l_orderkey" -> true, "l_linenumber" -> true),
      k = 3)
      .orderBy(col("l_suppkey"), col("l_extendedprice").desc,
        col("l_orderkey"), col("l_linenumber"))
  }

  /** SQL-string interface + subquery decorrelation: a correlated scalar
    * subquery (above-nation-average balance) and an EXISTS semi-join,
    * executed via spark.sql over registered views. The oracle is the
    * IDENTICAL SQL text — the check is that Catalyst's decorrelated plan
    * computes exactly what the direct evaluation does.
    */
  def q49: Q = {
    val sql = """
      |SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
      |FROM customer c
      |WHERE c.c_acctbal > (
      |        SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
      |                 / count(*)
      |        FROM customer c2
      |        WHERE c2.c_nationkey = c.c_nationkey)
      |  AND EXISTS (
      |        SELECT 1 FROM orders o
      |        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
      |ORDER BY c.c_custkey
      |""".stripMargin
    Q("q49_correlated_subqueries", Some(sql)) { (s, dir) =>
      Tables.customer(s, dir).createOrReplaceTempView("customer")
      Tables.orders(s, dir).createOrReplaceTempView("orders")
      s.sql(sql)
    }
  }

  /** Full-outer join with nulls surviving on both sides (completes the
    * join-type family: inner/left/semi/anti/asof are covered elsewhere).
    * High-value suppliers ⟗ high-balance customers per nation. */
  def q48: Q = Q(
    "q48_full_outer",
    Some("""
      |WITH s AS (
      |  SELECT s_nationkey AS nk, count(*) AS n_supp
      |  FROM supplier WHERE s_acctbal > 5000.0 GROUP BY s_nationkey),
      |c AS (
      |  SELECT c_nationkey AS nk, count(*) AS n_cust
      |  FROM customer WHERE c_acctbal > 9000.0 GROUP BY c_nationkey)
      |SELECT coalesce(s.nk, c.nk) AS nationkey,
      |       coalesce(n_supp, 0) AS n_supp, coalesce(n_cust, 0) AS n_cust
      |FROM s FULL OUTER JOIN c ON s.nk = c.nk
      |ORDER BY nationkey
      |""".stripMargin)) { (s, dir) =>
    val supp = Tables.supplier(s, dir).filter(col("s_acctbal") > 5000.0)
      .groupBy(col("s_nationkey").as("nk_s")).agg(count(lit(1)).as("n_supp"))
    val cust = Tables.customer(s, dir).filter(col("c_acctbal") > 9000.0)
      .groupBy(col("c_nationkey").as("nk_c")).agg(count(lit(1)).as("n_cust"))
    supp.join(cust, col("nk_s") === col("nk_c"), "full_outer")
      .select(
        coalesce(col("nk_s"), col("nk_c")).as("nationkey"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"))
      .orderBy(col("nationkey"))
  }

  /** Pivot (long → wide): per-user event-type counts and value sums as
    * columns. Spark pivot with an explicit value list (deterministic
    * column set); oracle uses portable FILTER aggregates.
    */
  def q44: Q = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val sqlCols = types.flatMap { t =>
      Seq(
        s"CAST(count(*) FILTER (event_type = '$t') AS BIGINT) AS n_$t",
        s"coalesce(CAST(sum(CAST(value AS DECIMAL(28,6))) FILTER (event_type = '$t') AS DOUBLE), 0.0) AS val_$t")
    }.mkString(",\n       ")
    Q("q44_pivot_event_types",
      Some(s"""
        |SELECT user_id,
        |       $sqlCols
        |FROM events
        |GROUP BY user_id ORDER BY user_id
        |""".stripMargin)) { (s, dir) =>
      import org.apache.spark.sql.types.DecimalType
      val ev = Tables.events(s, dir)
      val counts = ev.groupBy(col("user_id")).pivot("event_type", types)
        .agg(count(lit(1)).as("n"),
          coalesce(sum(col("value").cast(DecimalType(28, 6))).cast("double"), lit(0.0))
            .as("val"))
      // pivot names columns "<type>_n"/"<type>_val"; normalize to oracle names
      val renamed = types.foldLeft(counts) { (d, t) =>
        d.withColumnRenamed(s"${t}_n", s"n_$t").withColumnRenamed(s"${t}_val", s"val_$t")
      }
      renamed.na.fill(0L, types.map(t => s"n_$t"))
        .na.fill(0.0, types.map(t => s"val_$t"))
        .orderBy(col("user_id"))
    }
  }

  /** The full window-function family the reference never used: lag/lead,
    * rank/dense_rank over a total order, ntile, and a RANGE-framed sum
    * (events within the trailing 1000 s by event time). All deterministic:
    * every ordering is total (ts is unique; value ties broken by
    * event_id).
    */
  def q42: Q = Q(
    "q42_window_family",
    Some("""
      |SELECT event_id, user_id,
      |       lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
      |       lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
      |       rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS value_rank,
      |       ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS quartile,
      |       CAST(sum(CAST(value AS DECIMAL(28,6))) OVER (
      |         PARTITION BY user_id ORDER BY epoch_us(ts)
      |         RANGE BETWEEN 1000000000 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |         AS trailing_1000s_sum
      |FROM events
      |ORDER BY user_id, event_id
      |""".stripMargin)) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val byTime = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val byValue = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    // µs contract (DuckDB truncates ns timestamps on read)
    val byRange = Window.partitionBy(col("user_id")).orderBy(expr("ts div 1000"))
      .rangeBetween(-1000000000L, Window.currentRow)
    Tables.events(s, dir).select(
      col("event_id"), col("user_id"),
      lag(col("value"), 1).over(byTime).as("prev_value"),
      lead(col("value"), 1).over(byTime).as("next_value"),
      rank().over(byValue).as("value_rank"),
      ntile(4).over(byTime).as("quartile"),
      sum(col("value").cast(DecimalType(28, 6))).over(byRange).cast("double")
        .as("trailing_1000s_sum"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Set operations (INTERSECT / EXCEPT with distinct semantics) — the
    * U-family completion the reference never used. */
  def q40: Q = Q(
    "q40_set_ops",
    Some("""
      |WITH big AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 300000.0),
      |recent AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) >= 2000)
      |SELECT o_custkey, 'both' AS tag FROM (SELECT * FROM big INTERSECT SELECT * FROM recent)
      |UNION ALL
      |SELECT o_custkey, 'big_only' FROM (SELECT * FROM big EXCEPT SELECT * FROM recent)
      |ORDER BY tag, o_custkey
      |""".stripMargin)) { (s, dir) =>
    val orders = Tables.orders(s, dir)
    val big = orders.filter(col("o_totalprice") > 300000.0).select("o_custkey").distinct()
    val recent = orders.filter(year(col("o_orderdate")) >= 2000).select("o_custkey").distinct()
    big.intersect(recent).withColumn("tag", lit("both"))
      .unionByName(big.except(recent).withColumn("tag", lit("big_only")))
      .orderBy(col("tag"), col("o_custkey"))
  }

  /** ROLLUP grouping-set aggregation (subtotals + grand total; NULL marks
    * the rolled-up level). Spark sorts NULLS FIRST ascending — the oracle
    * pins the same order explicitly. */
  def q41: Q = Q(
    "q41_rollup",
    Some("""
      |SELECT CAST(year(o_orderdate) AS INTEGER) AS season, o_orderstatus,
      |       count(*) AS n,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY ROLLUP (season, o_orderstatus)
      |ORDER BY season NULLS FIRST, o_orderstatus NULLS FIRST
      |""".stripMargin)) { (s, dir) =>
    import org.apache.spark.sql.types.DecimalType
    Tables.orders(s, dir)
      .select(year(col("o_orderdate")).as("season"), col("o_orderstatus"), col("o_totalprice"))
      .rollup(col("season"), col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("total"))
      .orderBy(col("season").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
  }

  /** As-of join (union + ordered-window formulation, one shuffle, no
    * range-join explosion): for every event, the user's most recent
    * purchase event at-or-before it. Oracle: DuckDB's native ASOF JOIN.
    */
  def q37: Q = Q(
    "q37_asof_last_purchase",
    Some("""
      |SELECT e.event_id, e.user_id, p.event_id AS last_purchase_id,
      |       epoch_us(e.ts) - epoch_us(p.ts) AS us_since_purchase
      |FROM events e ASOF LEFT JOIN (
      |  SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON e.user_id = p.user_id AND e.ts >= p.ts
      |ORDER BY e.event_id
      |""".stripMargin)) { (s, dir) =>
    val ev = Tables.events(s, dir).select("event_id", "user_id", "ts", "event_type")
    val purchases = ev.filter(col("event_type") === "purchase")
    AsOf.asOfJoin(
      probe = ev, quote = purchases,
      keys = Seq("user_id"), tsCol = "ts", attachCols = Seq("event_id", "ts"))
      .select(
        col("event_id"), col("user_id"),
        col("asof_event_id").as("last_purchase_id"),
        // µs contract: DuckDB truncates ns timestamps to µs on read
        (expr("ts div 1000") - expr("asof_ts div 1000")).as("us_since_purchase"))
      .orderBy(col("event_id"))
  }

  /** Semi-structured JSON extraction (the props column): typed pull of a
    * JSON field + aggregation — the json-function family the reference
    * never needed. */
  def q39: Q = Q(
    "q39_json_props",
    Some("""
      |SELECT event_type,
      |       count(*) AS n,
      |       CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS k_total,
      |       min(CAST(json_extract(props, '$.k') AS INTEGER)) AS k_min,
      |       max(CAST(json_extract(props, '$.k') AS INTEGER)) AS k_max
      |FROM events
      |GROUP BY event_type ORDER BY event_type
      |""".stripMargin)) { (s, dir) =>
    val k = get_json_object(col("props"), "$.k").cast("int")
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(k).as("k_total"),
        min(k).as("k_min"),
        max(k).as("k_max"))
      .orderBy(col("event_type"))
  }

  /** Approximate sketches (HLL distinct count + approx percentile): no
    * cross-engine oracle exists for sketch internals, so the driver check
    * is rows-only; the accuracy envelope vs exact answers is unit-tested.
    */
  def q38: Q = Q(
    "q38_approx_sketches",
    None) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
          .as("approx_median_price"))
      .orderBy(col("l_returnflag"))
  }
}
