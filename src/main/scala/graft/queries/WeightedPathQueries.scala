package graft.queries

import org.apache.spark.sql.functions._
import graft.Materialize.MatOps

/** Round-10 weighted-path wave over the shared [[SupplierGraph]]
  * co-purchase graph: horizon-bounded Bellman–Ford (min-sum) and
  * widest-path (maximin) relaxations from the deterministic 32-source
  * budget, plus the closeness/dilation/convergence audits they
  * enable. Edge cost = 1 + 1000 div support (high-support ties are
  * cheap), edge width = the support itself.
  *
  * Semantics contract: every distance here is "best over paths of at
  * most H = 4 edges" — an exact metric BOTH engines compute
  * identically (unrolled MATERIALIZED stage CTEs on the DuckDB side,
  * per-round truncating materialize on the Spark side), so unlike an
  * until-quiescence loop nothing can silently diverge or fail at an
  * unseen sf; the convergence CURVE itself is a query (q965). H = 4
  * matches the budgeted-BFS exhaustion bound proven by q656/q473.
  *
  * Scale: O(budget · H · |E|) joins total, every per-round frame is
  * (budget × reached-node)-sized, lineage truncated per round —
  * the q473/q656 budget discipline, never an all-pairs walk. */
object WeightedPathQueries {

  val all: Seq[Q] = Seq(q961, q962, q963, q964, q965)

  private def hops = 4
  private def nHubs = 16
  private def nSpread = 16

  /** Weighted both-direction adjacency + budget CTEs (`ew`, `ed`,
    * `budget`). */
  private def sqlWeighted: String =
    s"""${SupplierGraph.sqlEdgeCtes},
       |ew AS (SELECT a, c, w, 1 + 1000 // w AS cost FROM e
       |       UNION ALL SELECT c, a, w, 1 + 1000 // w FROM e),
       |ed AS (SELECT a, c FROM ew),
       |${SupplierGraph.sqlBudgetCtes(nHubs, nSpread)}""".stripMargin

  /** Unrolled min-sum relaxation stages r0..r`hops` (MATERIALIZED —
    * each stage is referenced twice by the next). */
  private def sqlRelax: String = {
    val r0 = """r0 AS MATERIALIZED (
      |  SELECT v AS src, v AS node, CAST(0 AS BIGINT) AS wd
      |  FROM budget)""".stripMargin
    val steps = (1 to hops).map { k =>
      s"""r$k AS MATERIALIZED (
         |  SELECT src, node, min(wd) AS wd FROM (
         |    SELECT src, node, wd FROM r${k - 1}
         |    UNION ALL
         |    SELECT p.src, ew.c, p.wd + ew.cost
         |    FROM r${k - 1} p JOIN ew ON ew.a = p.node) u
         |  GROUP BY 1, 2)""".stripMargin
    }
    (r0 +: steps).mkString(",\n")
  }

  /** Unrolled maximin (widest-path) stages b0..b`hops`. */
  private def sqlWiden: String = {
    val b0 = """b0 AS MATERIALIZED (
      |  SELECT v AS src, v AS node, CAST(1000000000 AS BIGINT) AS bw
      |  FROM budget)""".stripMargin
    val steps = (1 to hops).map { k =>
      s"""b$k AS MATERIALIZED (
         |  SELECT src, node, max(bw) AS bw FROM (
         |    SELECT src, node, bw FROM b${k - 1}
         |    UNION ALL
         |    SELECT p.src, ew.c, least(p.bw, ew.w)
         |    FROM b${k - 1} p JOIN ew ON ew.a = p.node) u
         |  GROUP BY 1, 2)""".stripMargin
    }
    (b0 +: steps).mkString(",\n")
  }

  /** Shared Spark preamble: (weighted adjacency, budget sources). */
  private def spine(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val ew = SupplierGraph.weightedAdjacencyOf(SupplierGraph.edges(s, dir))
    (ew, SupplierGraph.budgetSources(ew, nHubs, nSpread))
  }

  /** Horizon-bounded weighted SSSP summary per budget source. */
  def q961: Q = Q(
    "q961_bounded_weighted_sssp",
    Some(s"""
      |WITH ${sqlWeighted},
      |${sqlRelax}
      |SELECT CAST(src AS BIGINT) AS src,
      |       CAST(count(*) - 1 AS BIGINT) AS n_reached,
      |       CAST(min(CASE WHEN wd > 0 THEN wd END) AS BIGINT) AS min_wd,
      |       CAST(sum(wd) AS BIGINT) AS sum_wd,
      |       CAST(max(wd) AS BIGINT) AS max_wd
      |FROM r$hops GROUP BY 1 ORDER BY src
      |""".stripMargin)) { (s, dir) =>
    val (ew, budget) = spine(s, dir)
    SupplierGraph.relaxMinSum(ew, budget, hops)
      .groupBy(col("src"))
      .agg((count(lit(1)) - 1).as("n_reached"),
        min(when(col("wd") > 0, col("wd"))).as("min_wd"),
        sum(col("wd")).as("sum_wd"),
        max(col("wd")).as("max_wd"))
      .select(col("src"), col("n_reached"), col("min_wd"),
        col("sum_wd"), col("max_wd"))
      .orderBy(col("src"))
  }

  /** Weighted closeness + weighted-harmonic centrality per source
    * (10^6 // wd keeps every harmonic term an exact integer). */
  def q962: Q = Q(
    "q962_weighted_closeness",
    Some(s"""
      |WITH ${sqlWeighted},
      |${sqlRelax}
      |SELECT CAST(src AS BIGINT) AS src,
      |       CAST(CASE WHEN sum(wd) = 0 THEN NULL
      |            ELSE (1000 * (count(*) - 1)) // sum(wd) END AS BIGINT)
      |         AS closeness_milli,
      |       CAST(sum(CASE WHEN wd > 0 THEN 1000000 // wd ELSE 0 END)
      |            AS BIGINT) AS harmonic_micro
      |FROM r$hops GROUP BY 1
      |ORDER BY closeness_milli DESC NULLS LAST, src
      |""".stripMargin)) { (s, dir) =>
    val (ew, budget) = spine(s, dir)
    SupplierGraph.relaxMinSum(ew, budget, hops)
      .groupBy(col("src"))
      .agg(count(lit(1)).as("cnt"), sum(col("wd")).as("swd"),
        sum(when(col("wd") > 0, expr("1000000 div wd")).otherwise(0L))
          .as("harmonic_micro"))
      .select(col("src"),
        expr("CAST(CASE WHEN swd = 0 THEN NULL" +
          " ELSE (1000 * (cnt - 1)) div swd END AS BIGINT)")
          .as("closeness_milli"),
        col("harmonic_micro"))
      .orderBy(col("closeness_milli").desc_nulls_last, col("src"))
  }

  /** Dilation audit: weighted distance vs the hop-count lower bound
    * cmin·hops (cmin = cheapest edge in the graph) over the SAME
    * (src, node) pairs — H-round relaxation reaches exactly the
    * ≤H-hop set, so the frames join totally. */
  def q963: Q = Q(
    "q963_path_dilation",
    Some(s"""
      |WITH RECURSIVE ${sqlWeighted},
      |${sqlRelax},
      |cm AS (SELECT min(cost) AS cmin FROM ew),
      |walk(src, node, d) AS (
      |  SELECT v, v, 0 FROM budget
      |  UNION
      |  SELECT DISTINCT w.src, ed.c, w.d + 1
      |  FROM walk w JOIN ed ON ed.a = w.node WHERE w.d < $hops),
      |dist AS (SELECT src, node, min(d) AS d FROM walk GROUP BY 1, 2)
      |SELECT CAST(r.src AS BIGINT) AS src,
      |       CAST(sum(r.wd) AS BIGINT) AS sum_wd,
      |       CAST(sum(dist.d) AS BIGINT) AS sum_hops,
      |       CAST(CASE WHEN sum(dist.d) = 0 THEN NULL
      |            ELSE (1000 * sum(r.wd)) // (cm.cmin * sum(dist.d))
      |            END AS BIGINT) AS dilation_milli,
      |       CAST(sum(CASE WHEN r.wd > cm.cmin * dist.d THEN 1 ELSE 0
      |            END) AS BIGINT) AS n_detour
      |FROM r$hops r JOIN dist ON dist.src = r.src AND dist.node = r.node
      |CROSS JOIN cm
      |GROUP BY 1, cm.cmin ORDER BY src
      |""".stripMargin)) { (s, dir) =>
    val (ew, budget) = spine(s, dir)
    // dual-label relaxation: min-sum cost AND min hop count ride the
    // SAME walk (each is an independent min over path costs; after H
    // rounds hd is exactly the ≤H-hop BFS distance) — size-gated
    // single-task twin in SupplierGraph.relaxDual
    val d = SupplierGraph.relaxDual(ew, budget, hops)
    val cm = ew.agg(min(col("cost")).as("cmin"))
    d.crossJoin(broadcast(cm))
      .groupBy(col("src"), col("cmin"))
      .agg(sum(col("wd")).as("sum_wd"), sum(col("d")).as("sum_hops"),
        sum(when(col("wd") > col("cmin") * col("d"), 1L).otherwise(0L))
          .as("n_detour"))
      .select(col("src"), col("sum_wd"), col("sum_hops"),
        expr("CAST(CASE WHEN sum_hops = 0 THEN NULL" +
          " ELSE (1000 * sum_wd) div (cmin * sum_hops) END AS BIGINT)")
          .as("dilation_milli"),
        col("n_detour"))
      .orderBy(col("src"))
  }

  /** Widest-path (bottleneck) profile per source over non-self
    * reached nodes: how much co-purchase support the weakest link of
    * the best route guarantees. */
  def q964: Q = Q(
    "q964_widest_path_bottleneck",
    Some(s"""
      |WITH ${sqlWeighted},
      |${sqlWiden}
      |SELECT CAST(src AS BIGINT) AS src,
      |       CAST(count(*) AS BIGINT) AS n_reached,
      |       CAST(min(bw) AS BIGINT) AS min_width,
      |       CAST(max(bw) AS BIGINT) AS max_width,
      |       CAST(sum(bw) AS BIGINT) AS sum_width
      |FROM b$hops WHERE node <> src GROUP BY 1 ORDER BY src
      |""".stripMargin)) { (s, dir) =>
    val (ew, budget) = spine(s, dir)
    SupplierGraph.relaxMaxMin(ew, budget, hops)
      .where(col("node") =!= col("src"))
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n_reached"), min(col("bw")).as("min_width"),
        max(col("bw")).as("max_width"), sum(col("bw")).as("sum_width"))
      .orderBy(col("src"))
  }

  /** Relaxation convergence curve: per round k, the frontier size,
    * how many (src, node) labels improved vs round k−1, and the total
    * label mass — the observable that says how far from quiescence
    * the H-bounded metric is (n_improved(H) = 0 ⇔ the bounded
    * distance is already the true weighted distance). Driver-side
    * loop of H bounded counts — the per-round frames are
    * (budget × node)-sized. */
  def q965: Q = Q(
    "q965_relaxation_convergence",
    Some {
      val perRound = (1 to hops).map { k =>
        s"""cv$k AS (
           |  SELECT $k AS round,
           |    (SELECT count(*) FROM r$k) AS n_pairs,
           |    (SELECT count(*) FROM r$k r LEFT JOIN r${k - 1} p
           |       ON p.src = r.src AND p.node = r.node
           |     WHERE p.wd IS NULL OR r.wd < p.wd) AS n_improved,
           |    (SELECT sum(wd) FROM r$k) AS sum_wd)""".stripMargin
      }.mkString(",\n")
      s"""
      |WITH ${sqlWeighted},
      |${sqlRelax},
      |$perRound
      |SELECT CAST(round AS BIGINT) AS round,
      |       CAST(n_pairs AS BIGINT) AS n_pairs,
      |       CAST(n_improved AS BIGINT) AS n_improved,
      |       CAST(sum_wd AS BIGINT) AS sum_wd
      |FROM (${(1 to hops).map(k => s"SELECT * FROM cv$k").mkString(" UNION ALL ")})
      |ORDER BY round
      |""".stripMargin
    }) { (s, dir) =>
    val (ew, budget) = spine(s, dir)
    SupplierGraph.relaxStats(ew, budget, hops)
      .orderBy(col("round"))
  }
}
