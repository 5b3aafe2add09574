package graft.queries

import org.apache.spark.sql.functions._
import graft.Materialize.MatOps

/** Round-9 budget-centrality wave over the shared [[SupplierGraph]]
  * co-purchase graph: budgeted closeness/harmonic centrality, a
  * truncated Katz series, a hub-knockout reachability audit, the
  * average-neighbor-degree (assortativity) curve, and the local
  * clustering-coefficient profile by degree quartile. Every face rides
  * the budget/BFS discipline proven on q473 — deterministic source
  * budgets, capped anti-join-pruned walks, O(budget·|E|) plans — or a
  * degree-oriented wedge enumeration (O(E^1.5) bound); nothing joins
  * the adjacency on both endpoints of a fact-scaled frame. Degree
  * buckets are VALUE-CUT order statistics over the degree histogram
  * (ties share a bucket), never a row-rank window over the node dim —
  * the supplier dim scales with the data. */
object CentralityQueries {

  val all: Seq[Q] = Seq(q656, q657, q658, q659, q660)

  private def maxHops = 4

  /** Budgeted closeness + harmonic centrality: for each of the 64
    * deterministic budget sources (32 hubs + 32 hash-spread), the
    * exact distance sum over its component, closeness
    * (n_reached−1)·1000 // Σd and harmonic centrality Σ 12000//d
    * (12000 = 1000·lcm(1..4), so every 1/d term is an exact integer
    * at the 4-hop cap). Distances are exact within components — the
    * walk asserts BFS exhaustion (q473's contract); disconnection is
    * legal and closeness is component-local, the stated contract. */
  def q656: Q = Q(
    "q656_budget_closeness",
    Some(s"""
      |WITH RECURSIVE ${SupplierGraph.sqlEdgeCtes},
      |ed AS (SELECT a, c FROM e UNION ALL SELECT c, a FROM e),
      |${SupplierGraph.sqlBudgetCtes(32, 32)},
      |walk(src, node, d) AS (
      |  SELECT v, v, 0 FROM budget
      |  UNION
      |  SELECT DISTINCT w.src, ed.c, w.d + 1
      |  FROM walk w JOIN ed ON ed.a = w.node WHERE w.d < $maxHops),
      |dist AS (SELECT src, node, min(d) AS d FROM walk GROUP BY 1, 2),
      |cl AS (
      |  SELECT src, count(*) AS reached, sum(d) AS sum_d,
      |         sum(CASE WHEN d > 0 THEN 12000 // d ELSE 0 END) AS harm
      |  FROM dist GROUP BY 1)
      |SELECT CAST(src AS BIGINT) AS src,
      |       CAST(reached AS BIGINT) AS n_reached,
      |       CAST(sum_d AS BIGINT) AS sum_dist,
      |       CAST(CASE WHEN sum_d = 0 THEN NULL
      |            ELSE (1000 * (reached - 1)) // sum_d END AS BIGINT)
      |         AS closeness_milli,
      |       CAST(harm AS BIGINT) AS harmonic_sc
      |FROM cl ORDER BY src
      |""".stripMargin)) { (s, dir) =>
    val ed = SupplierGraph.adjacency(s, dir)
    val budget = SupplierGraph.budgetSources(ed, 32, 32)
    SupplierGraph.bfsFrom(ed, budget, maxHops, assertExhausted = true)
      .groupBy(col("src"))
      .agg(count(lit(1)).as("reached"), sum(col("d")).as("sum_d"),
        sum(when(col("d") > 0, expr("12000 div d")).otherwise(0L))
          .as("harm"))
      .select(col("src"), col("reached").as("n_reached"),
        col("sum_d").as("sum_dist"),
        expr("CAST(CASE WHEN sum_d = 0 THEN NULL" +
          " ELSE (1000 * (reached - 1)) div sum_d END AS BIGINT)")
          .as("closeness_milli"),
        col("harm").as("harmonic_sc"))
      .orderBy(col("src"))
  }

  /** Truncated Katz centrality (α = 1/8, depth 4), exact integers:
    * X(v) = Σ_{k=0..4} 8^{4−k}·paths_k(v) where paths_k = A^k·1 —
    * four neighbor-sum rounds (one join + one aggregate each, the
    * constant-depth iteration pattern), coefficients scaled by 8^4 so
    * no division ever happens. Top-10 nodes. Sums ride DECIMAL(38,0)
    * (path counts grow as deg^4); the BIGINT output cast is the loud
    * ANSI bound — Σ deg⁴ must fit 2⁶³, true through ~10⁴ average
    * degree. */
  def q657: Q = {
    val coefs = Seq(4096L, 512L, 64L, 8L, 1L) // 8^(4-k)
    Q("q657_katz_centrality",
      Some(s"""
        |WITH ${SupplierGraph.sqlEdgeCtes},
        |ed AS (SELECT a, c FROM e UNION ALL SELECT c, a FROM e),
        |s1 AS MATERIALIZED (
        |  SELECT a AS v, CAST(count(*) AS HUGEINT) AS x
        |  FROM ed GROUP BY 1),
        |s2 AS MATERIALIZED (
        |  SELECT ed.a AS v, sum(s1.x) AS x
        |  FROM ed JOIN s1 ON s1.v = ed.c GROUP BY 1),
        |s3 AS MATERIALIZED (
        |  SELECT ed.a AS v, sum(s2.x) AS x
        |  FROM ed JOIN s2 ON s2.v = ed.c GROUP BY 1),
        |s4 AS MATERIALIZED (
        |  SELECT ed.a AS v, sum(s3.x) AS x
        |  FROM ed JOIN s3 ON s3.v = ed.c GROUP BY 1)
        |SELECT CAST(s1.v AS BIGINT) AS node,
        |       CAST(${coefs(0)} + ${coefs(1)} * s1.x + ${coefs(2)} * s2.x
        |            + ${coefs(3)} * s3.x + ${coefs(4)} * s4.x AS BIGINT)
        |         AS katz_sc
        |FROM s1 JOIN s2 ON s2.v = s1.v JOIN s3 ON s3.v = s1.v
        |     JOIN s4 ON s4.v = s1.v
        |ORDER BY katz_sc DESC, node LIMIT 10
        |""".stripMargin)) { (s, dir) =>
      val ed = SupplierGraph.adjacency(s, dir)
      val s1 = ed.groupBy(col("ea").as("v"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("x"))
        .materialize(truncate = true)
      def step(prev: org.apache.spark.sql.DataFrame) =
        ed.join(prev.select(col("v").as("pv"), col("x").as("px")),
            col("ec") === col("pv"))
          .groupBy(col("ea").as("v")).agg(sum(col("px")).as("x"))
          .materialize(truncate = true) // constant-depth iteration
      val s2 = step(s1)
      val s3 = step(s2)
      val s4 = step(s3)
      s1.select(col("v"), col("x").as("x1"))
        .join(s2.select(col("v").as("v2"), col("x").as("x2")),
          col("v") === col("v2"))
        .join(s3.select(col("v").as("v3"), col("x").as("x3")),
          col("v") === col("v3"))
        .join(s4.select(col("v").as("v4"), col("x").as("x4")),
          col("v") === col("v4"))
        .select(col("v").as("node"),
          expr(s"CAST(${coefs(0)} + ${coefs(1)} * x1 + ${coefs(2)} * x2" +
            s" + ${coefs(3)} * x3 + ${coefs(4)} * x4 AS BIGINT)")
            .as("katz_sc"))
        .orderBy(col("katz_sc").desc, col("node"))
        .limit(10)
    }
  }

  /** Hub-knockout reachability audit — "how fragile is the network to
    * losing its hubs": remove the top-8 nodes by degree, then measure
    * the 4-hop reach of the 32 hash-spread budget sources of the
    * PRUNED graph (the capped reach IS the metric here, so no
    * exhaustion assert — fragmentation is the finding, not an error).
    * One row: original/pruned sizes and the min/max/sum of per-source
    * reach. All-scalar-subquery output so the row exists even when the
    * knockout empties the graph (it does at sf0.001: 7 nodes). */
  def q658: Q = {
    val nKnock = 8
    Q("q658_hub_knockout_reach",
      Some(s"""
        |WITH RECURSIVE ${SupplierGraph.sqlEdgeCtes},
        |ed0 AS (SELECT a, c FROM e UNION ALL SELECT c, a FROM e),
        |dg0 AS (SELECT a AS v, count(*) AS dg FROM ed0 GROUP BY 1),
        |knock AS (SELECT v FROM dg0 ORDER BY dg DESC, v LIMIT $nKnock),
        |ek AS (SELECT a, c FROM e
        |       WHERE a NOT IN (SELECT v FROM knock)
        |         AND c NOT IN (SELECT v FROM knock)),
        |ed AS (SELECT a, c FROM ek UNION ALL SELECT c, a FROM ek),
        |deg AS (SELECT a AS v, count(*) AS dg FROM ed GROUP BY 1),
        |spr AS (SELECT v FROM deg
        |        ORDER BY (v * 2654435761) % 2147483648, v LIMIT 32),
        |walk(src, node, d) AS (
        |  SELECT v, v, 0 FROM spr
        |  UNION
        |  SELECT DISTINCT w.src, ed.c, w.d + 1
        |  FROM walk w JOIN ed ON ed.a = w.node WHERE w.d < $maxHops),
        |cl AS (SELECT src, count(DISTINCT node) AS reached
        |       FROM walk GROUP BY 1)
        |SELECT CAST((SELECT count(*) FROM dg0) AS BIGINT) AS n_nodes,
        |       CAST((SELECT count(*) FROM knock) AS BIGINT)
        |         AS n_hubs_removed,
        |       CAST((SELECT count(*) FROM ek) AS BIGINT) AS n_edges_kept,
        |       CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes_kept,
        |       CAST((SELECT count(*) FROM cl) AS BIGINT) AS n_sources,
        |       CAST((SELECT coalesce(min(reached), 0) FROM cl) AS BIGINT)
        |         AS reach_min,
        |       CAST((SELECT coalesce(max(reached), 0) FROM cl) AS BIGINT)
        |         AS reach_max,
        |       CAST((SELECT coalesce(sum(reached), 0) FROM cl) AS BIGINT)
        |         AS reach_sum
        |""".stripMargin)) { (s, dir) =>
      val e = SupplierGraph.edges(s, dir).select(col("a"), col("c"))
        .materialize()
      val ed0 = SupplierGraph.adjacencyOf(e)
      val dg0 = ed0.groupBy(col("ea")).agg(count(lit(1)).as("dg"))
        .materialize() // supplier dim
      val nNodes = dg0.count()
      val knock = dg0.orderBy(col("dg").desc, col("ea")).limit(nKnock)
        .select(col("ea").as("kv"))
      val ek = e
        .join(broadcast(knock), col("a") === col("kv"), "left_anti")
        .join(broadcast(knock), col("c") === col("kv"), "left_anti")
        .materialize()
      val nKept = ek.count()
      val ed = SupplierGraph.adjacencyOf(ek)
      val nNodesKept = ed.select(col("ea")).distinct().count()
      val deg = ed.groupBy(col("ea")).agg(count(lit(1)).as("dg"))
      val spr = deg
        .orderBy(pmod(col("ea") * 2654435761L, lit(2147483648L)),
          col("ea"))
        .limit(32)
        .select(col("ea").as("src"))
      // reach sizes per source — bounded collect (≤ 32 rows)
      val reaches = SupplierGraph.bfsFrom(ed, spr, maxHops)
        .groupBy(col("src")).agg(count(lit(1)).as("reached"))
        .collect().map(_.getAs[Long]("reached"))
      val knocked = math.min(nKnock.toLong, nNodes)
      import s.implicits._
      Seq((nNodes, knocked, nKept, nNodesKept, reaches.length.toLong,
          if (reaches.isEmpty) 0L else reaches.min,
          if (reaches.isEmpty) 0L else reaches.max,
          reaches.sum))
        .toDF("n_nodes", "n_hubs_removed", "n_edges_kept", "n_nodes_kept",
          "n_sources", "reach_min", "reach_max", "reach_sum")
    }
  }

  /** SQL for the degree value-cut thresholds at permilles `ps` over
    * the `deg`(v, dg) CTE: the rank-⌈p·n/1000⌉ degree via the
    * cumulative HISTOGRAM walk (distinct degree values, not node
    * rows — the node dim scales with the data, the value dim doesn't).
    * Mirrors OrderStats.weightedQuantilesDisc with unit weights. */
  private def sqlDegThresholds(ps: Seq[Int]): String = {
    val vals = ps.map(p => s"($p)").mkString(", ")
    s"""dh AS (SELECT dg, count(*) AS c FROM deg GROUP BY 1),
       |dr AS (SELECT dg, c, sum(c) OVER (ORDER BY dg) AS cw,
       |              (SELECT count(*) FROM deg) AS n FROM dh),
       |pt(p) AS (VALUES $vals),
       |dthr AS (
       |  SELECT pt.p, dr.dg AS t
       |  FROM dr JOIN pt ON dr.cw - dr.c < (pt.p * dr.n + 999) // 1000
       |                 AND (pt.p * dr.n + 999) // 1000 <= dr.cw)""".stripMargin
  }

  /** Spark twin of [[sqlDegThresholds]]: (p, t) threshold rows. */
  private def degThresholds(deg: org.apache.spark.sql.DataFrame,
      ps: Seq[Int]): org.apache.spark.sql.DataFrame =
    graft.operators.OrderStats.weightedQuantilesDisc(
        deg.withColumn("k", lit(0L)).withColumn("one", lit(1L)),
        Seq("k"), "dg", "one", ps)
      .select(col("permille").as("p"), col("value").as("t"))

  /** Average-neighbor-degree curve by degree decile — the
    * assortativity PROFILE behind q303's single coefficient: nodes
    * bucketed by value-cut degree deciles (ties share a bucket), each
    * bucket reporting its exact degree-weighted mean neighbor degree
    * (1000·Σ_v Σ_{u∈N(v)} deg(u) // Σ_v deg(v)). A falling curve =
    * hubs attach to low-degree nodes (disassortative, the co-purchase
    * expectation). One adjacency join against the broadcast degree
    * dim; bucket assignment is 9 broadcast threshold comparisons. */
  def q659: Q = Q(
    "q659_neighbor_degree_curve",
    Some(s"""
      |WITH ${SupplierGraph.sqlEdgeCtes},
      |ed AS (SELECT a, c FROM e UNION ALL SELECT c, a FROM e),
      |deg AS (SELECT a AS v, count(*) AS dg FROM ed GROUP BY 1),
      |${sqlDegThresholds((1 to 9).map(_ * 100))},
      |bkt AS (
      |  SELECT deg.v, deg.dg,
      |         (SELECT count(*) FROM dthr WHERE dthr.t < deg.dg) AS b
      |  FROM deg),
      |nbr AS (
      |  SELECT ed.a AS v, sum(d2.dg) AS ns
      |  FROM ed JOIN deg d2 ON d2.v = ed.c GROUP BY 1)
      |SELECT CAST(b AS BIGINT) AS decile,
      |       CAST(count(*) AS BIGINT) AS n_nodes,
      |       CAST((1000 * sum(bkt.dg)) // count(*) AS BIGINT)
      |         AS avg_deg_milli,
      |       CAST((1000 * sum(nbr.ns)) // sum(bkt.dg) AS BIGINT)
      |         AS avg_nbr_deg_milli
      |FROM bkt JOIN nbr ON nbr.v = bkt.v
      |GROUP BY 1 ORDER BY 1
      |""".stripMargin)) { (s, dir) =>
    val ed = SupplierGraph.adjacency(s, dir)
    val deg = ed.groupBy(col("ea").as("v")).agg(count(lit(1)).as("dg"))
      .materialize() // supplier dim: thresholds, buckets, nbr read it
    val thr = degThresholds(deg, (1 to 9).map(_ * 100))
    val bkt = deg.join(broadcast(thr), col("t") < col("dg"), "left")
      .groupBy(col("v"), col("dg"))
      .agg(count(col("t")).as("b"))
    val nbr = ed
      .join(broadcast(deg.select(col("v").as("nv"), col("dg").as("ndg"))),
        col("ec") === col("nv"))
      .groupBy(col("ea").as("v")).agg(sum(col("ndg")).as("ns"))
    bkt.join(nbr.withColumnRenamed("v", "nbv"), col("v") === col("nbv"))
      .groupBy(col("b").as("decile"))
      .agg(count(lit(1)).as("n_nodes"),
        expr("(1000 * sum(dg)) div count(1)").as("avg_deg_milli"),
        expr("(1000 * sum(ns)) div sum(dg)").as("avg_nbr_deg_milli"))
      .orderBy(col("decile"))
  }

  /** Local clustering-coefficient profile by degree quartile: per node
    * cc_ppm = 2·10⁶·tri(v) // (deg·(deg−1)) with tri(v) from the
    * degree-ORIENTED wedge enumeration (each triangle found once at
    * its pivot, O(√E) fan-out — q591's discipline), credited to all
    * three corners; nodes with deg < 2 are out of domain. The falling-
    * with-degree profile (hierarchy) vs flat (random) diagnostic,
    * bucketed by the same value-cut order stats as q659. */
  def q660: Q = Q(
    "q660_local_clustering_profile",
    Some(s"""
      |WITH ${SupplierGraph.sqlEdgeCtes},
      |ed AS (SELECT a, c FROM e UNION ALL SELECT c, a FROM e),
      |deg AS (SELECT a AS v, count(*) AS dg FROM ed GROUP BY 1),
      |${sqlDegThresholds(Seq(250, 500, 750))},
      |esup AS (
      |  SELECT e.a, e.c, count(*) AS s
      |  FROM e JOIN ed p ON p.a = e.a
      |       JOIN ed q ON q.a = e.c AND q.c = p.c
      |  GROUP BY 1, 2),
      |tri AS (
      |  SELECT v, sum(s) // 2 AS t FROM (
      |    SELECT a AS v, s FROM esup
      |    UNION ALL SELECT c AS v, s FROM esup) u
      |  GROUP BY 1),
      |ccn AS (
      |  SELECT deg.v, deg.dg,
      |         (2000000 * coalesce(tri.t, 0))
      |           // (deg.dg * (deg.dg - 1)) AS cc
      |  FROM deg LEFT JOIN tri ON tri.v = deg.v
      |  WHERE deg.dg >= 2),
      |bkt AS (
      |  SELECT ccn.v, ccn.cc,
      |         (SELECT count(*) FROM dthr WHERE dthr.t < ccn.dg) AS b
      |  FROM ccn)
      |SELECT CAST(b AS BIGINT) AS quartile,
      |       CAST(count(*) AS BIGINT) AS n_nodes,
      |       CAST(sum(cc) // count(*) AS BIGINT) AS mean_cc_ppm,
      |       CAST(max(cc) AS BIGINT) AS max_cc_ppm
      |FROM bkt GROUP BY 1 ORDER BY 1
      |""".stripMargin)) { (s, dir) =>
    val e = SupplierGraph.edges(s, dir).select(col("a"), col("c"))
      .materialize()
    val deg = SupplierGraph.adjacencyOf(e)
      .groupBy(col("ea").as("v")).agg(count(lit(1)).as("dg"))
      .materialize()
    val thr = degThresholds(deg, Seq(250, 500, 750))
    // per-edge triangle support via the shared degree-oriented wedge
    // enumeration (Triangles.edgeSupport — q591's discipline); halve
    // per-node edge-support sums to get tri(v)
    val sup = graft.operators.Triangles.edgeSupport(e)
    val tri = sup.select(col("a").as("v"), col("s"))
      .unionAll(sup.select(col("c").as("v"), col("s")))
      .groupBy(col("v")).agg(expr("sum(s) div 2").as("t"))
    val ccn = deg
      .join(tri.withColumnRenamed("v", "tv"), col("v") === col("tv"),
        "left")
      .where(col("dg") >= 2)
      .select(col("v"), col("dg"),
        expr("(2000000 * coalesce(t, 0)) div (dg * (dg - 1))").as("cc"))
    ccn.join(broadcast(thr), col("t") < col("dg"), "left")
      .groupBy(col("v"), col("cc"))
      .agg(count(col("t")).as("b"))
      .groupBy(col("b").as("quartile"))
      .agg(count(lit(1)).as("n_nodes"),
        expr("sum(cc) div count(1)").as("mean_cc_ppm"),
        max(col("cc")).as("max_cc_ppm"))
      .orderBy(col("quartile"))
  }
}
