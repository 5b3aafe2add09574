package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Materialize.MatOps
import graft.Tables

/** Round-7 brokerage wave: Burt's structural holes, a survivorship-
  * bias audit, a winsorization-level sensitivity sweep, the
  * configuration-model-normalized rich club (making q526 honest), and
  * an order-consolidation what-if. All exact integers over bounded
  * dims. */
object BrokerageQueries {

  val all: Seq[Q] = Seq(q551, q552, q553, q554, q555)

  /** Structural holes (Burt's effective size, simplified Borgatti
    * form ES = k − 2t/k with t = triangles through the node): the
    * suppliers brokering between otherwise-unconnected neighborhoods —
    * high ES with high degree marks the network's gatekeepers. Top-10
    * brokers; triangle counts from one path-2 closure on the shared
    * supplier graph. */
  def q551: Q = Q(
    "q551_structural_holes",
    Some(s"""
      |WITH ${SupplierGraph.sqlEdgeCtes},
      |ed AS (SELECT a, c FROM e UNION ALL SELECT c, a FROM e),
      |deg AS (SELECT a AS node, count(*) AS k FROM ed GROUP BY 1),
      |tri AS (
      |  SELECT x.a AS node, count(*) // 2 AS t
      |  FROM ed x JOIN ed y ON y.a = x.c
      |       JOIN e z ON z.a = least(x.a, y.c)
      |              AND z.c = greatest(x.a, y.c)
      |  GROUP BY 1),
      |es AS (
      |  SELECT deg.node, deg.k, coalesce(tri.t, 0) AS t,
      |         (1000 * (deg.k * deg.k - 2 * coalesce(tri.t, 0))) // deg.k
      |           AS es_milli
      |  FROM deg LEFT JOIN tri ON tri.node = deg.node)
      |SELECT CAST(node AS BIGINT) AS supplier,
      |       CAST(k AS BIGINT) AS degree,
      |       CAST(t AS BIGINT) AS triangles,
      |       CAST(es_milli AS BIGINT) AS effective_size_milli
      |FROM es ORDER BY es_milli DESC, supplier LIMIT 10
      |""".stripMargin)) { (s, dir) =>
    val e = SupplierGraph.edges(s, dir).select(col("a"), col("c"))
      .materialize()
    val ed = e.unionAll(e.select(col("c").as("a"), col("a").as("c")))
      .materialize()
    val deg = ed.groupBy(col("a").as("node")).agg(count(lit(1)).as("k"))
    // triangles through x.a: neighbor pairs (x.c, y.c) closed by an edge
    val tri = ed.select(col("a").as("n0"), col("c").as("n1"))
      .join(ed.select(col("a").as("m0"), col("c").as("n2")),
        col("m0") === col("n1"))
      .join(e.select(col("a").as("za"), col("c").as("zc")),
        col("za") === least(col("n0"), col("n2"))
          && col("zc") === greatest(col("n0"), col("n2")))
      .groupBy(col("n0").as("tnode"))
      .agg(expr("count(1) div 2").as("t"))
    deg.join(tri, col("tnode") === col("node"), "left")
      .select(col("node").as("supplier"), col("k").as("degree"),
        coalesce(col("t"), lit(0L)).as("triangles"),
        expr("(1000 * (k * k - 2 * coalesce(t, 0))) div k")
          .as("effective_size_milli"))
      .orderBy(col("effective_size_milli").desc, col("supplier"))
      .limit(10)
  }

  /** Survivorship-bias audit: mean early-half spend of ALL customers
    * vs only those still active in the late half — the retrospective-
    * cohort inflation every "our customers spend $X" claim hides.
    * Exact integer means and a permille bias ratio. */
  def q552: Q = Q(
    "q552_survivorship_bias",
    Some("""
      |WITH sp AS (
      |  SELECT c.c_custkey AS k,
      |         coalesce(CAST(sum(CASE WHEN year(o.o_orderdate) <= 1997
      |                  THEN CAST(o.o_totalprice * 100 AS HUGEINT)
      |                  ELSE 0 END) AS BIGINT), 0) AS h1,
      |         max(CASE WHEN year(o.o_orderdate) >= 1998 THEN 1 ELSE 0
      |             END) AS survivor
      |  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      |  GROUP BY 1),
      |ag AS (
      |  SELECT count(*) AS n_all, sum(h1) AS s_all,
      |         sum(CASE WHEN survivor = 1 THEN 1 ELSE 0 END) AS n_srv,
      |         sum(CASE WHEN survivor = 1 THEN h1 ELSE 0 END) AS s_srv
      |  FROM sp)
      |SELECT CAST(n_all AS BIGINT) AS n_customers,
      |       CAST(n_srv AS BIGINT) AS n_survivors,
      |       CAST(s_all // n_all AS BIGINT) AS mean_h1_all_cents,
      |       CAST(s_srv // n_srv AS BIGINT) AS mean_h1_survivors_cents,
      |       CAST((1000 * (s_srv // n_srv)) // (s_all // n_all)
      |            AS BIGINT) AS bias_ratio_milli
      |FROM ag
      |""".stripMargin)) { (s, dir) =>
    val sp = Tables.customer(s, dir).select(col("c_custkey").as("k"))
      .join(Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_totalprice"),
          col("o_orderdate")),
        col("o_custkey") === col("k"), "left")
      .groupBy(col("k"))
      .agg(coalesce(expr("CAST(sum(CASE WHEN year(o_orderdate) <= 1997" +
        " THEN CAST(o_totalprice * 100 AS DECIMAL(38,0))" +
        " ELSE CAST(0 AS DECIMAL(38,0)) END) AS BIGINT)"), lit(0L))
        .as("h1"),
        max(when(year(col("o_orderdate")) >= 1998, 1L).otherwise(0L))
          .as("survivor"))
    sp.agg(count(lit(1)).as("n_all"), sum(col("h1")).as("s_all"),
        sum(when(col("survivor") === 1, 1L).otherwise(0L)).as("n_srv"),
        sum(when(col("survivor") === 1, col("h1")).otherwise(0L))
          .as("s_srv"))
      .select(col("n_all").as("n_customers"),
        col("n_srv").as("n_survivors"),
        expr("s_all div n_all").as("mean_h1_all_cents"),
        expr("s_srv div n_srv").as("mean_h1_survivors_cents"),
        expr("(1000 * (s_srv div n_srv)) div (s_all div n_all)")
          .as("bias_ratio_milli"))
  }

  /** Winsorization sensitivity sweep: the mean order total under no
    * clipping and clipping at the p99/p95/p90 order statistics — how
    * much of the headline mean is tail? The robustness sweep run
    * before fixing any winsorization policy (q173/q510 pick ONE
    * level; this shows the curve). Exact clipped sums. */
  def q553: Q = Q(
    "q553_winsorization_sweep",
    Some("""
      |WITH v AS (
      |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
      |  FROM orders),
      |qs AS (
      |  SELECT p.p,
      |         max(CASE WHEN rn = (p.p * n + 999) // 1000 THEN c END)
      |           AS cap
      |  FROM (SELECT c, row_number() OVER (ORDER BY c) AS rn,
      |               count(*) OVER () AS n FROM v) r
      |  CROSS JOIN (SELECT unnest([1000, 990, 950, 900]) AS p) p
      |  GROUP BY 1),
      |sw AS (
      |  SELECT qs.p, qs.cap, count(*) AS n,
      |         sum(least(v.c, qs.cap)) AS s,
      |         sum(CASE WHEN v.c > qs.cap THEN 1 ELSE 0 END) AS clipped
      |  FROM v CROSS JOIN qs GROUP BY 1, 2)
      |SELECT CAST(p AS BIGINT) AS level_permille,
      |       CAST(cap AS BIGINT) AS cap_cents,
      |       CAST(clipped AS BIGINT) AS n_clipped,
      |       CAST(s // n AS BIGINT) AS winsorized_mean_cents
      |FROM sw ORDER BY level_permille DESC
      |""".stripMargin)) { (s, dir) =>
    import s.implicits._
    val v = Tables.orders(s, dir)
      .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
        .as("c"))
      .materialize()
    val qs = graft.operators.OrderStats.quantilesDisc(
        v.withColumn("k", lit(0L)), Seq("k"), "c",
        Seq(1000, 990, 950, 900))
      .select(col("permille").as("p"), col("value").as("cap"))
    v.crossJoin(broadcast(qs))
      .groupBy(col("p"), col("cap"))
      .agg(count(lit(1)).as("n"), sum(least(col("c"), col("cap"))).as("s"),
        sum(when(col("c") > col("cap"), 1L).otherwise(0L)).as("clipped"))
      .select(col("p").cast("long").as("level_permille"),
        col("cap").as("cap_cents"), col("clipped").as("n_clipped"),
        expr("s div n").as("winsorized_mean_cents"))
      .orderBy(col("level_permille").desc)
  }

  /** Rich club NORMALIZED by the configuration model: observed rich
    * density over the degree-preserving expectation
    * Σ kᵢkⱼ/(2m) = ((Σk)² − Σk²)/(4m) — q526's raw coefficient can
    * rise purely because hubs have more stubs; the ratio > 1 is the
    * honest claim. Exact integer arithmetic per degree level. */
  def q554: Q = Q(
    "q554_rich_club_normalized",
    Some(s"""
      |WITH ${SupplierGraph.sqlEdgeCtes},
      |deg AS (
      |  SELECT node, count(*) AS k FROM (
      |    SELECT a AS node FROM e UNION ALL SELECT c FROM e) u
      |  GROUP BY 1),
      |m AS (SELECT count(*) AS m FROM e),
      |ks AS (
      |  SELECT p.p,
      |         coalesce(max(CASE WHEN rn = (p.p * n + 999) // 1000
      |                  THEN k END), -1) AS kt
      |  FROM (SELECT k, row_number() OVER (ORDER BY k) AS rn,
      |               count(*) OVER () AS n FROM deg) r
      |  CROSS JOIN (SELECT unnest([500, 750, 900]) AS p) p
      |  GROUP BY 1),
      |rich AS (
      |  SELECT ks.p, ks.kt, count(*) AS nr, sum(deg.k) AS sk,
      |         sum(CAST(deg.k AS HUGEINT) * deg.k) AS sk2
      |  FROM ks JOIN deg ON deg.k > ks.kt
      |  GROUP BY 1, 2),
      |re AS (
      |  SELECT ks.p, count(*) AS er
      |  FROM ks JOIN e ON TRUE
      |  JOIN deg da ON da.node = e.a JOIN deg dc ON dc.node = e.c
      |  WHERE da.k > ks.kt AND dc.k > ks.kt
      |  GROUP BY 1)
      |SELECT CAST(rich.p AS BIGINT) AS degree_permille,
      |       CAST(rich.nr AS BIGINT) AS n_rich,
      |       CAST(coalesce(re.er, 0) AS BIGINT) AS observed_edges,
      |       CAST((CAST(rich.sk AS HUGEINT) * rich.sk - rich.sk2)
      |            // (4 * m.m) AS BIGINT) AS expected_edges,
      |       CAST(CASE WHEN CAST(rich.sk AS HUGEINT) * rich.sk - rich.sk2
      |                 = 0 THEN 0
      |            ELSE (1000 * coalesce(re.er, 0) * 4 * CAST(m.m AS HUGEINT))
      |                 // (CAST(rich.sk AS HUGEINT) * rich.sk - rich.sk2)
      |            END AS BIGINT) AS normalized_milli
      |FROM rich LEFT JOIN re ON re.p = rich.p CROSS JOIN m
      |ORDER BY degree_permille
      |""".stripMargin)) { (s, dir) =>
    val e = SupplierGraph.edges(s, dir).select(col("a"), col("c"))
      .materialize()
    val deg = e.select(col("a").as("node"))
      .unionAll(e.select(col("c").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("k"))
      .materialize()
    val m = e.agg(count(lit(1)).as("m"))
    val ks = graft.operators.OrderStats.quantilesDisc(
        deg.withColumn("k0", lit(0L)), Seq("k0"), "k", Seq(500, 750, 900))
      .select(col("permille").as("p"), col("value").as("kt"))
      .materialize()
    val rich = ks.join(deg, col("k") > col("kt"))
      .groupBy(col("p"), col("kt"))
      .agg(count(lit(1)).as("nr"), sum(col("k")).as("sk"),
        sum(col("k").cast("decimal(38,0)") * col("k")).as("sk2"))
    val re = ks.join(e, expr("true"))
      .join(deg.select(col("node").as("na"), col("k").as("ka")),
        col("na") === col("a"))
      .join(deg.select(col("node").as("nc"), col("k").as("kc")),
        col("nc") === col("c"))
      .where(col("ka") > col("kt") && col("kc") > col("kt"))
      .groupBy(col("p")).agg(count(lit(1)).as("er"))
    rich.join(re.withColumnRenamed("p", "rp"),
        col("rp") === col("p"), "left")
      .crossJoin(broadcast(m))
      .select(col("p").cast("long").as("degree_permille"),
        col("nr").as("n_rich"),
        coalesce(col("er"), lit(0L)).as("observed_edges"),
        expr("CAST((CAST(sk AS DECIMAL(38,0)) * sk - sk2) div (4 * m)" +
          " AS BIGINT)").as("expected_edges"),
        expr("CAST(CASE WHEN CAST(sk AS DECIMAL(38,0)) * sk - sk2 = 0" +
          " THEN 0 ELSE (1000 * coalesce(er, 0) * 4" +
          " * CAST(m AS DECIMAL(38,0)))" +
          " div (CAST(sk AS DECIMAL(38,0)) * sk - sk2) END AS BIGINT)")
          .as("normalized_milli"))
      .orderBy(col("degree_permille"))
  }

  /** Order-consolidation what-if: if each customer's orders within 7
    * days of the previous were merged into one shipment, how many
    * shipments disappear? Per-customer gap sessionization (the q53
    * machinery pointed at orders), exact integer savings. */
  def q555: Q = Q(
    "q555_order_consolidation",
    Some("""
      |WITH o AS (
      |  SELECT o_custkey AS k, epoch_us(o_orderdate) // 86400000000 AS d,
      |         o_orderkey AS ok
      |  FROM orders),
      |g AS (
      |  SELECT k, d - lag(d) OVER (PARTITION BY k
      |           ORDER BY d, ok) AS gap
      |  FROM o),
      |ag AS (
      |  SELECT count(*) AS n_orders,
      |         sum(CASE WHEN gap IS NULL OR gap > 7 THEN 1 ELSE 0 END)
      |           AS n_clusters
      |  FROM g)
      |SELECT CAST(n_orders AS BIGINT) AS n_orders,
      |       CAST(n_clusters AS BIGINT) AS n_shipments_consolidated,
      |       CAST(n_orders - n_clusters AS BIGINT) AS shipments_saved,
      |       CAST((1000 * (n_orders - n_clusters)) // n_orders AS BIGINT)
      |         AS saving_permille
      |FROM ag
      |""".stripMargin)) { (s, dir) =>
    val o = Tables.orders(s, dir)
      .select(col("o_custkey").as("k"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))" +
          " div 86400000000").as("d"),
        col("o_orderkey").as("ok"))
    val w = Window.partitionBy(col("k")).orderBy(col("d"), col("ok"))
    val g = o.withColumn("gap", col("d") - lag(col("d"), 1).over(w))
    g.agg(count(lit(1)).as("n_orders"),
        sum(when(col("gap").isNull || col("gap") > 7, 1L).otherwise(0L))
          .as("n_clusters"))
      .select(col("n_orders"),
        col("n_clusters").as("n_shipments_consolidated"),
        (col("n_orders") - col("n_clusters")).as("shipments_saved"),
        expr("(1000 * (n_orders - n_clusters)) div n_orders")
          .as("saving_permille"))
  }
}
