package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-8 planner wave: Silver–Meal lot sizing replay over monthly
  * demand, a Horvitz–Thompson stratified-sample total with exact
  * inclusion weights, a sort-key (zone-map) advisor that scores
  * candidate physical orders by chunk pruning, a functional-dependency
  * audit (g₃ violation counts), and Yule's K lexical concentration.
  * The sequential piece (Silver–Meal) folds over the ≤ 90-month dim;
  * the advisor's fact-scaled ranks ride bucket-parallel
  * globalRankCum. */
object PlannerQueries {

  val all: Seq[Q] = Seq(q601, q602, q603, q604, q605)

  /** Silver–Meal dynamic lot sizing replayed over the monthly quantity
    * series: extend the current lot while the average per-period cost
    * (K + holding)/periods does not increase, else set up a new lot.
    * The avg comparison cross-multiplies to exact integers
    * ((K+H′)·k > (K+H)·(k+1)), the fold state is five scalars, and
    * both engines left-fold the identical recurrence over the
    * month-dim array (DuckDB list_reduce ≡ Spark aggregate). K = $500
    * setup, h = 10¢/unit·month. */
  def q601: Q = {
    val setupK = 50000L
    val holdH = 10L
    Q("q601_silver_meal_lots",
      Some(s"""
        |WITH RECURSIVE m AS (
        |  SELECT year(l_shipdate) * 12 + month(l_shipdate) AS mo,
        |         sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS d
        |  FROM lineitem GROUP BY 1),
        |md AS (SELECT mo, d, row_number() OVER (ORDER BY mo) AS i,
        |              count(*) OVER () AS n FROM m),
        |-- RECURSIVE month walk, NOT list_reduce: even a SINGLE-ROW
        |-- struct-accumulator list_reduce mis-evaluates on some inputs
        |-- (wrong total at sf0.001 vs an independent replay of the
        |-- fold; q497/q637 family, NOTES.md) — the recursive CTE is
        |-- iterative by semantics and engine-stable.
        |walk(i, k, h, setups, total) AS (
        |  SELECT 0, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
        |         CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |  UNION ALL
        |  SELECT w.i + 1,
        |    CASE WHEN w.k = 0 OR ($setupK + w.h + $holdH * w.k * md.d)
        |           * w.k > ($setupK + w.h) * (w.k + 1)
        |         THEN 1 ELSE w.k + 1 END,
        |    CASE WHEN w.k = 0 OR ($setupK + w.h + $holdH * w.k * md.d)
        |           * w.k > ($setupK + w.h) * (w.k + 1)
        |         THEN 0 ELSE w.h + $holdH * w.k * md.d END,
        |    w.setups + CASE WHEN w.k = 0
        |           OR ($setupK + w.h + $holdH * w.k * md.d) * w.k
        |              > ($setupK + w.h) * (w.k + 1) THEN 1 ELSE 0 END,
        |    w.total + CASE WHEN w.k <> 0
        |           AND ($setupK + w.h + $holdH * w.k * md.d) * w.k
        |               > ($setupK + w.h) * (w.k + 1)
        |          THEN $setupK + w.h ELSE 0 END
        |  FROM walk w JOIN md ON md.i = w.i + 1)
        |SELECT CAST((SELECT max(n) FROM md) AS BIGINT) AS n_months,
        |       CAST(setups AS BIGINT) AS n_setups,
        |       CAST(total + $setupK + h AS BIGINT) AS total_cost_cents
        |FROM walk WHERE i = (SELECT max(n) FROM md)
        |""".stripMargin)) { (s, dir) =>
      val m = Tables.lineitem(s, dir)
        .groupBy((year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
          .as("mo"))
        .agg(sum(expr("CAST(floor(l_quantity + 0.5) AS BIGINT)")).as("d"))
      m.agg(sort_array(collect_list(struct(col("mo"), col("d"))))
          .as("rows"), count(lit(1)).as("nm"))
        .select(col("nm"), expr(
          s"""aggregate(transform(rows, r -> r.d),
             |  named_struct('k', CAST(0 AS BIGINT),
             |    'h', CAST(0 AS BIGINT), 'setups', CAST(0 AS BIGINT),
             |    'total', CAST(0 AS BIGINT)),
             |  (a, d) -> CASE
             |    WHEN a.k = 0 THEN named_struct('k', CAST(1 AS BIGINT),
             |      'h', CAST(0 AS BIGINT), 'setups', CAST(1 AS BIGINT),
             |      'total', CAST(0 AS BIGINT))
             |    WHEN ($setupK + a.h + $holdH * a.k * d) * a.k
             |         > ($setupK + a.h) * (a.k + 1)
             |    THEN named_struct('k', CAST(1 AS BIGINT),
             |      'h', CAST(0 AS BIGINT), 'setups', a.setups + 1,
             |      'total', a.total + $setupK + a.h)
             |    ELSE named_struct('k', a.k + 1,
             |      'h', a.h + $holdH * a.k * d, 'setups', a.setups,
             |      'total', a.total)
             |    END)""".stripMargin).as("st"))
        .select(col("nm").as("n_months"),
          col("st.setups").as("n_setups"),
          (col("st.total") + lit(setupK) + col("st.h"))
            .as("total_cost_cents"))
    }
  }

  /** Horvitz–Thompson estimate of total event value from a
    * DETERMINISTIC stratified systematic sample (event_id mod k per
    * event-type stratum, purchase 1/2, click 1/5, view 1/10, other
    * 1/20): each sampled row carries weight k, the estimator is the
    * exact weighted sum, and the known truth gives the signed error.
    * The estimator face every sampled pipeline needs: totals from a
    * sample with KNOWN inclusion probabilities, not ad-hoc scaling. */
  def q602: Q = Q(
    "q602_horvitz_thompson_total",
    Some("""
      |WITH e AS (
      |  SELECT event_type AS stratum, event_id,
      |         CASE event_type WHEN 'purchase' THEN 2 WHEN 'click' THEN 5
      |           WHEN 'view' THEN 10 ELSE 20 END AS k,
      |         CAST(value * 100 AS HUGEINT) AS v
      |  FROM events WHERE value IS NOT NULL),
      |ag AS (
      |  SELECT stratum, max(k) AS k, count(*) AS n, sum(v) AS true_total,
      |         count(*) FILTER (event_id % k = 0) AS n_sampled,
      |         sum(CASE WHEN event_id % k = 0 THEN v * k ELSE 0 END)
      |           AS ht_total
      |  FROM e GROUP BY 1)
      |SELECT stratum, CAST(n AS BIGINT) AS n_events,
      |       CAST(n_sampled AS BIGINT) AS n_sampled,
      |       CAST(true_total AS BIGINT) AS true_total_cents,
      |       CAST(ht_total AS BIGINT) AS ht_total_cents,
      |       CAST(floor(CAST(ht_total - true_total AS DOUBLE)
      |         / CAST(true_total AS DOUBLE) * 1000000.0) AS BIGINT)
      |         AS err_ppm
      |FROM ag ORDER BY stratum
      |""".stripMargin)) { (s, dir) =>
    val e = Tables.events(s, dir)
      .where(col("value").isNotNull)
      .select(col("event_type").as("stratum"), col("event_id"),
        expr("CASE event_type WHEN 'purchase' THEN 2 WHEN 'click' THEN 5" +
          " WHEN 'view' THEN 10 ELSE 20 END").as("k"),
        expr("CAST(value * 100 AS DECIMAL(38,0))").as("v"))
    e.groupBy(col("stratum"))
      .agg(max(col("k")).as("k"), count(lit(1)).as("n"),
        sum(col("v")).as("true_total"),
        count(when(expr("event_id % k = 0"), 1)).as("n_sampled"),
        sum(when(expr("event_id % k = 0"), col("v") * col("k"))
          .otherwise(lit(0))).as("ht_total"))
      .select(col("stratum"), col("n").as("n_events"), col("n_sampled"),
        col("true_total").cast("long").as("true_total_cents"),
        col("ht_total").cast("long").as("ht_total_cents"),
        expr("CAST(floor(CAST(ht_total - true_total AS DOUBLE)" +
          " / CAST(true_total AS DOUBLE) * 1000000.0) AS BIGINT)")
          .as("err_ppm"))
      .orderBy(col("stratum"))
  }

  /** Sort-key advisor: for each candidate physical order (ship date,
    * supplier, order key), lay the fact table out in 8,192-row chunks
    * UNDER THAT ORDER and score how many chunks a 12-window ship-date
    * workload could zone-map-prune. Ranks are bucket-parallel
    * (globalRankCum — the rank dim IS the fact table); per-chunk
    * min/max is one hash aggregate; the 36 (candidate, window) pairs
    * are a literal dim. The pruning share is the advisor's answer to
    * "which sort key earns its shuffle". */
  def q603: Q = {
    val day0 = 9862L // epoch day of 1997-01-01
    val wins = (0 until 12).map(i => (day0 + 30 * i, day0 + 30 * (i + 1)))
    val winSql = wins.zipWithIndex
      .map { case ((lo, hi), i) => s"SELECT $i AS w, $lo AS lo, $hi AS hi" }
      .mkString("\n  UNION ALL ")
    def orcCand(name: String, ord: String) = s"""
      |c_$name AS (
      |  SELECT (row_number() OVER (ORDER BY $ord, l_orderkey,
      |            l_linenumber) - 1) // 8192 AS chunk,
      |         epoch_us(l_shipdate) // 86400000000 AS sd
      |  FROM lineitem),
      |g_$name AS (
      |  SELECT chunk, min(sd) AS mn, max(sd) AS mx
      |  FROM c_$name GROUP BY 1),
      |p_$name AS (
      |  SELECT '$name' AS candidate,
      |         (SELECT count(*) FROM g_$name) AS n_chunks,
      |         count(*) AS pruned
      |  FROM g_$name CROSS JOIN wins
      |  WHERE mx < wins.lo OR mn >= wins.hi)""".stripMargin
    Q("q603_sortkey_advisor",
      Some(s"""
        |WITH wins AS (
        |  $winSql),
        |${orcCand("shipdate", "epoch_us(l_shipdate) // 86400000000")},
        |${orcCand("suppkey", "l_suppkey")},
        |${orcCand("orderkey", "l_orderkey")}
        |SELECT candidate, CAST(n_chunks AS BIGINT) AS n_chunks,
        |       CAST(pruned AS BIGINT) AS pruned_chunk_windows,
        |       CAST((1000 * pruned) // (n_chunks * 12) AS BIGINT)
        |         AS pruned_permille
        |FROM (SELECT * FROM p_shipdate UNION ALL
        |      SELECT * FROM p_suppkey UNION ALL
        |      SELECT * FROM p_orderkey)
        |ORDER BY candidate
        |""".stripMargin)) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))" +
            " div 86400000000").as("sd"),
          (col("l_orderkey") * 8 + col("l_linenumber")).as("uid"))
        .materialize() // three rank passes read one scan
      val winDf = {
        import s.implicits._
        wins.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
          .toDF("w", "lo", "hi")
      }
      def cand(name: String, c: org.apache.spark.sql.Column,
          bucket: org.apache.spark.sql.Column): DataFrame = {
        val ranked = graft.dedup.SortedNeighborhood.globalRankCum(
          li.withColumn("__ord", c).withColumn("__bkt", bucket),
          idCol = "uid", bucketCol = "__bkt", tieCols = Seq("__ord"))
        val g = ranked
          .select(expr("(__rank - 1) div 8192").as("chunk"), col("sd"))
          .groupBy(col("chunk"))
          .agg(min(col("sd")).as("mn"), max(col("sd")).as("mx"))
          .materialize() // chunk dim feeds the count AND the prune join
        val nc = g.agg(count(lit(1)).as("n_chunks"))
        g.crossJoin(broadcast(winDf))
          .where(col("mx") < col("lo") || col("mn") >= col("hi"))
          .agg(count(lit(1)).as("pruned"))
          .crossJoin(broadcast(nc))
          .select(lit(name).as("candidate"), col("n_chunks"),
            col("pruned"))
      }
      cand("shipdate", col("sd"), expr("sd div 32"))
        .unionAll(cand("suppkey", col("l_suppkey"),
          expr("l_suppkey div 8")))
        .unionAll(cand("orderkey", col("l_orderkey"),
          expr("l_orderkey div 4096")))
        .select(col("candidate"), col("n_chunks"),
          col("pruned").as("pruned_chunk_windows"),
          expr("CAST((1000 * pruned) div (n_chunks * 12) AS BIGINT)")
            .as("pruned_permille"))
        .orderBy(col("candidate"))
    }
  }

  /** Functional-dependency audit with the g₃ error (minimum rows to
    * delete so X → Y holds): for each candidate FD, group by (X, Y),
    * keep each X-group's majority Y count, g₃ = n − Σ max — zero for
    * the two joins' true dependencies, positive for the two planted
    * fakes. The profiling primitive schema-inference and key-discovery
    * tools are built on. */
  def q604: Q = {
    def orcFd(name: String, frm: String, x: String, y: String) = s"""
      |fd_$name AS (
      |  SELECT '$name' AS fd, sum(cn) AS n_rows,
      |         count(*) AS n_groups, sum(mc) AS kept
      |  FROM (
      |    SELECT x, max(c) AS mc, sum(c) AS cn FROM (
      |      SELECT $x AS x, $y AS y, count(*) AS c FROM $frm GROUP BY 1, 2)
      |    GROUP BY 1) m)""".stripMargin
    Q("q604_functional_dependency_audit",
      Some(s"""
        |WITH lp AS (
        |  SELECT l.l_partkey, l.l_suppkey, p.p_brand
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |sn AS (
        |  SELECT l.l_suppkey, s.s_nationkey, l.l_orderkey
        |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey),
        |oc AS (
        |  SELECT o.o_custkey, o.o_orderpriority, c.c_nationkey
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |${orcFd("partkey_to_brand", "lp", "l_partkey", "p_brand")},
        |${orcFd("suppkey_to_nation", "sn", "l_suppkey", "s_nationkey")},
        |${orcFd("partkey_to_suppkey", "lp", "l_partkey", "l_suppkey")},
        |${orcFd("custkey_to_priority", "oc", "o_custkey",
          "o_orderpriority")}
        |SELECT fd, CAST(n_rows AS BIGINT) AS n_rows,
        |       CAST(n_groups AS BIGINT) AS n_groups,
        |       CAST(n_rows - kept AS BIGINT) AS g3_violations,
        |       CAST((1000000 * (n_rows - kept)) // n_rows AS BIGINT)
        |         AS g3_ppm
        |FROM (SELECT * FROM fd_partkey_to_brand UNION ALL
        |      SELECT * FROM fd_suppkey_to_nation UNION ALL
        |      SELECT * FROM fd_partkey_to_suppkey UNION ALL
        |      SELECT * FROM fd_custkey_to_priority)
        |ORDER BY fd
        |""".stripMargin)) { (s, dir) =>
      val lp = Tables.lineitem(s, dir)
        .join(Tables.part(s, dir)
          .select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_suppkey"), col("p_brand"))
        .materialize()
      val sn = Tables.lineitem(s, dir)
        .join(Tables.supplier(s, dir)
          .select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("l_suppkey"), col("s_nationkey"))
      val oc = Tables.orders(s, dir)
        .join(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_custkey"), col("o_orderpriority"),
          col("c_nationkey"))
        .materialize()
      def fd(name: String, df: DataFrame, x: String, y: String) =
        df.groupBy(col(x).as("x"), col(y).as("y"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("x")).agg(max(col("c")).as("mc"),
            sum(col("c")).as("cn"))
          .agg(lit(name).as("fd"), sum(col("cn")).as("n_rows"),
            count(lit(1)).as("n_groups"), sum(col("mc")).as("kept"))
      fd("partkey_to_brand", lp, "l_partkey", "p_brand")
        .unionAll(fd("suppkey_to_nation", sn, "l_suppkey", "s_nationkey"))
        .unionAll(fd("partkey_to_suppkey", lp, "l_partkey", "l_suppkey"))
        .unionAll(fd("custkey_to_priority", oc, "o_custkey",
          "o_orderpriority"))
        .select(col("fd"), col("n_rows"), col("n_groups"),
          (col("n_rows") - col("kept")).as("g3_violations"),
          expr("(1000000 * (n_rows - kept)) div n_rows").as("g3_ppm"))
        .orderBy(col("fd"))
    }
  }

  /** Yule's K lexical concentration of the corpus: K = 10⁴·(Σc² − N)/N²
    * over the token frequency spectrum (Σ_m m²V_m ≡ Σ_types c²) — the
    * repeated-vocabulary diagnostic that, unlike a raw TTR, is
    * text-length invariant. One token pass, one vocab-dim aggregate,
    * exact integers to the final pinned division. */
  def q605: Q = Q(
    "q605_yules_k",
    Some(s"""
      |WITH t AS (
      |  SELECT unnest(${PipelineQueries.sqlTokens("text")}) AS w
      |  FROM documents WHERE text IS NOT NULL),
      |c AS (SELECT w, count(*) AS c FROM t GROUP BY 1),
      |ag AS (SELECT count(*) AS types, sum(c) AS n,
      |              sum(CAST(c AS HUGEINT) * c) AS q FROM c)
      |SELECT CAST(n AS BIGINT) AS n_tokens, CAST(types AS BIGINT) AS n_types,
      |       CAST(floor(10000.0 * CAST(q - n AS DOUBLE)
      |         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) * 1000.0)
      |         AS BIGINT) AS yules_k_milli
      |FROM ag
      |""".stripMargin)) { (s, dir) =>
    val c = Tables.documents(s, dir)
      .where(col("text").isNotNull)
      .select(explode(graft.text.TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    c.agg(count(lit(1)).as("types"), sum(col("c")).as("n"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("q"))
      .select(col("n").as("n_tokens"), col("types").as("n_types"),
        expr("CAST(floor(10000.0 * CAST(q - n AS DOUBLE)" +
          " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) * 1000.0)" +
          " AS BIGINT)").as("yules_k_milli"))
  }
}
