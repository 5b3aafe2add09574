package graft.queries

import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-7 robust-inference wave: Brown–Forsythe variance-equality
  * test, Cochran–Armitage trend test, all-pairs graph eccentricity
  * (diameter/radius/periphery), negative-binomial method-of-moments
  * fit, and a Simpson's-paradox reversal audit. Group means are
  * permille-quantized before any squared-deviation arithmetic (the
  * stated statistic contract), so every sum is an exact
  * DECIMAL/HUGEINT; the only doubles are final pinned divisions. */
object RobustQueries {

  val all: Seq[Q] = Seq(q471, q472, q473, q474, q475)

  /** Brown–Forsythe test (Levene with medians) for equal price spread
    * across brands: z = |price − median(brand)|, then a one-way F on
    * the z's with permille-quantized group means. Robust to the
    * non-normality a plain Levene would choke on; the statistic a
    * pricing analyst checks before pooling brand variances. Brand
    * medians are exact order statistics; SSB/SSW are exact integer
    * sums in milli² units. */
  def q471: Q = Q(
    "q471_brown_forsythe_prices",
    Some("""
      |WITH x AS (
      |  SELECT p_brand AS g,
      |         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS c
      |  FROM part),
      |md AS (
      |  SELECT g, max(CASE WHEN rn = (500 * n + 999) // 1000 THEN c END)
      |           AS med
      |  FROM (SELECT g, c, row_number() OVER (PARTITION BY g ORDER BY c)
      |               AS rn, count(*) OVER (PARTITION BY g) AS n FROM x) r
      |  GROUP BY 1),
      |z AS (SELECT x.g, abs(x.c - md.med) AS z
      |      FROM x JOIN md ON x.g = md.g),
      |gs AS (SELECT g, count(*) AS ng, sum(z) AS sg,
      |              sum(CAST(z AS HUGEINT) * z) AS qg,
      |              (1000 * sum(z)) // count(*) AS mg
      |       FROM z GROUP BY 1),
      |tot AS (SELECT count(*) AS k, sum(ng) AS n,
      |               (1000 * sum(sg)) // sum(ng) AS m FROM gs),
      |ss AS (
      |  SELECT max(tot.n) AS n, max(tot.k) AS k,
      |         sum(CAST(ng AS HUGEINT) * (mg - tot.m) * (mg - tot.m))
      |           AS ssb,
      |         sum(1000000 * qg - 2000 * CAST(mg AS HUGEINT) * sg
      |             + CAST(ng AS HUGEINT) * mg * mg) AS ssw
      |  FROM gs CROSS JOIN tot)
      |SELECT CAST(n AS BIGINT) AS n_parts, CAST(k AS BIGINT) AS k_brands,
      |       CAST(floor(CAST(
      |           CAST((n - k) AS DOUBLE) * CAST(ssb AS DOUBLE)
      |           / (CAST((k - 1) AS DOUBLE) * CAST(ssw AS DOUBLE))
      |         AS DECIMAL(28,6)) * 1000) AS BIGINT) AS f_milli
      |FROM ss
      |""".stripMargin)) { (s, dir) =>
    val x = Tables.part(s, dir)
      .select(col("p_brand").as("g"),
        expr("CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)").as("c"))
      .materialize()
    val md = graft.operators.OrderStats.quantilesDisc(
        x, Seq("g"), "c", Seq(500))
      .select(col("g").as("mg_"), col("value").as("med"))
    val z = x.join(broadcast(md), col("g") === col("mg_"))
      .select(col("g"), abs(col("c") - col("med")).as("z"))
    val gs = z.groupBy(col("g"))
      .agg(count(lit(1)).as("ng"), sum(col("z")).as("sg"),
        sum(col("z").cast("decimal(38,0)") * col("z")).as("qg"),
        expr("(1000 * sum(z)) div count(1)").as("mg"))
      .materialize() // 25-row brand dim
    val tot = gs.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
      expr("(1000 * sum(sg)) div sum(ng)").as("m"))
    gs.crossJoin(broadcast(tot))
      .agg(max(col("n")).as("n"), max(col("k")).as("k"),
        sum(expr("CAST(ng AS DECIMAL(38,0)) * (mg - m) * (mg - m)"))
          .as("ssb"),
        sum(expr("1000000 * qg - 2000 * CAST(mg AS DECIMAL(38,0)) * sg" +
          " + CAST(ng AS DECIMAL(38,0)) * mg * mg")).as("ssw"))
      .select(col("n").as("n_parts"), col("k").as("k_brands"),
        expr("""CAST(floor(CAST(
            CAST((n - k) AS DOUBLE) * CAST(ssb AS DOUBLE)
            / (CAST((k - 1) AS DOUBLE) * CAST(ssw AS DOUBLE))
          AS DECIMAL(28,6)) * 1000) AS BIGINT)""").as("f_milli"))
  }

  /** Cochran–Armitage trend test: does return probability trend
    * monotonically with the (ordered) discount level? Scores are the
    * levels themselves; Z² = (NΣsr − RΣsn)²·N / [R(N−R)(NΣs²n −
    * (Σsn)²)] entirely in exact DECIMAL/HUGEINT, one final pinned
    * double division. The dose-response screen run before any
    * "discounts drive returns" claim. */
  def q472: Q = Q(
    "q472_cochran_armitage_trend",
    Some("""
      |WITH l AS (
      |  SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS sc,
      |         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      |  FROM lineitem),
      |lv AS (SELECT sc, count(*) AS n, sum(y) AS r FROM l GROUP BY 1),
      |m AS (SELECT sum(n) AS n, sum(r) AS rr, sum(sc * n) AS sn,
      |             sum(sc * r) AS sr, sum(sc * sc * n) AS s2n FROM lv),
      |st AS (
      |  SELECT n, rr,
      |         CAST(n AS HUGEINT) * sr - CAST(rr AS HUGEINT) * sn AS num,
      |         CAST(rr AS HUGEINT) * (n - rr)
      |           * (CAST(n AS HUGEINT) * s2n - CAST(sn AS HUGEINT) * sn)
      |           AS den
      |  FROM m)
      |SELECT CAST(n AS BIGINT) AS n_lines, CAST(rr AS BIGINT) AS n_returned,
      |       CASE WHEN num > 0 THEN 'rising' WHEN num < 0 THEN 'falling'
      |            ELSE 'flat' END AS trend,
      |       CAST(floor(CAST(
      |           CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
      |             * CAST(n AS DOUBLE) / CAST(den AS DOUBLE)
      |         AS DECIMAL(28,6)) * 1000) AS BIGINT) AS z2_milli
      |FROM st
      |""".stripMargin)) { (s, dir) =>
    val lv = Tables.lineitem(s, dir)
      .select(expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)").as("sc"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
      .groupBy(col("sc")).agg(count(lit(1)).as("n"), sum(col("y")).as("r"))
    lv.agg(sum(col("n")).as("n"), sum(col("r")).as("rr"),
        sum(col("sc") * col("n")).as("sn"),
        sum(col("sc") * col("r")).as("sr"),
        sum(col("sc") * col("sc") * col("n")).as("s2n"))
      .select(col("n"), col("rr"),
        expr("CAST(n AS DECIMAL(38,0)) * sr - CAST(rr AS DECIMAL(38,0)) * sn")
          .as("num"),
        expr("CAST(rr AS DECIMAL(38,0)) * (n - rr) * " +
          "(CAST(n AS DECIMAL(38,0)) * s2n - CAST(sn AS DECIMAL(38,0)) * sn)")
          .as("den"))
      .select(col("n").as("n_lines"), col("rr").as("n_returned"),
        when(col("num") > 0, "rising").when(col("num") < 0, "falling")
          .otherwise("flat").as("trend"),
        expr("""CAST(floor(CAST(
            CAST(num AS DOUBLE) * CAST(num AS DOUBLE) * CAST(n_lines AS DOUBLE)
              / CAST(den AS DOUBLE)
          AS DECIMAL(28,6)) * 1000) AS BIGINT)""").as("z2_milli"))
  }

  /** BUDGETED eccentricity audit of the supplier co-purchase graph
    * (the shared scale-free [[SupplierGraph]] edges): exact
    * eccentricity for a deterministic 64-source budget — the 32
    * highest-degree hubs plus 32 hash-spread nodes (Knuth
    * multiplicative spread on the node id) — reported as diameter/
    * radius BOUNDS (max sampled ecc ≤ diameter, min sampled ecc ≥
    * radius... the sampled max is a diameter LOWER bound and, because
    * the radius is attained at some node, the sampled min is a radius
    * UPPER bound) plus the peripheral/central counts WITHIN the
    * budget. Round 8 proved exact all-node ecc is the wrong contract
    * on this dense diameter-2/3 graph (Θ(V·E) inherent — PLANS.md
    * documents the iFUB squeeze regressing 17→87 s because an ecc-k
    * node's upper bound only closes via itself as pivot); the budget
    * contract is the honest 100×-scale face: ONE capped multi-source
    * walk from 64 sources, O(64·|E|) at any graph size, with the
    * DuckDB oracle replaying the identical budget. Eccentricities are
    * exact WITHIN each source's component (the walk asserts the BFS
    * exhausted below the hop cap — a still-live frontier would mean
    * truncated eccs and fails loudly; disconnection itself is legal,
    * the tiny sf0.001 graph exercises it). */
  def q473: Q = {
    val maxHops = 4
    val nHubs = 32
    val nSpread = 32
    val knuth = 2654435761L
    val mod = 2147483648L
    Q("q473_supplier_eccentricity",
      Some(s"""
        |WITH RECURSIVE ${SupplierGraph.sqlEdgeCtes},
        |ed AS (SELECT a, c FROM e UNION ALL SELECT c, a FROM e),
        |deg AS (SELECT a AS v, count(*) AS dg FROM ed GROUP BY 1),
        |hub AS (SELECT v FROM deg ORDER BY dg DESC, v LIMIT $nHubs),
        |spr AS (SELECT v FROM deg
        |        ORDER BY (v * $knuth) % $mod, v LIMIT $nSpread),
        |budget AS (SELECT DISTINCT v FROM (
        |  SELECT v FROM hub UNION ALL SELECT v FROM spr) u),
        |walk(src, node, d) AS (
        |  SELECT v, v, 0 FROM budget
        |  UNION
        |  SELECT DISTINCT w.src, ed.c, w.d + 1
        |  FROM walk w JOIN ed ON ed.a = w.node WHERE w.d < $maxHops),
        |dist AS (SELECT src, node, min(d) AS d FROM walk GROUP BY 1, 2),
        |ecc AS (SELECT src, max(d) AS ecc FROM dist GROUP BY 1)
        |SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
        |       CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
        |       CAST(count(*) AS BIGINT) AS n_sources,
        |       CAST(max(ecc) AS BIGINT) AS diameter_lb,
        |       CAST(min(ecc) AS BIGINT) AS radius_ub,
        |       CAST(sum(CASE WHEN ecc = (SELECT max(ecc) FROM ecc)
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_peripheral,
        |       CAST(sum(CASE WHEN ecc = (SELECT min(ecc) FROM ecc)
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_central
        |FROM ecc
        |""".stripMargin)) { (s, dir) =>
      val e = SupplierGraph.edges(s, dir).select(col("a"), col("c"))
      val ed = SupplierGraph.adjacencyOf(e)
      val budget = SupplierGraph.budgetSources(ed, nHubs, nSpread)
      // the shared capped multi-source BFS (SupplierGraph.bfsFrom):
      // anti-join-pruned frontiers, one materialize per round, and the
      // exhaustion assert — every reported ecc is the true
      // eccentricity WITHIN its source's component (disconnection is
      // legal, the sf0.001 graph exercises it; truncation fails loud)
      val walk = SupplierGraph
        .bfsFrom(ed, budget, maxHops, assertExhausted = true)
        .groupBy(col("src"))
        .agg(max(col("d")).as("ecc"), count(lit(1)).as("reached"))
      // ONE action finishes the query: the ecc frame is budget-sized
      // (≤ 64 rows — bounded by construction, documented collect), so
      // the diameter/radius bounds and the peripheral/central counts
      // are driver-side arithmetic, not four more jobs
      val nV = ed.select(col("ea")).distinct().count()
      val nE = e.count()
      val rows = walk.collect()
      val eccs = rows.map(_.getAs[Long]("ecc"))
      val (dia, rad) = (eccs.max, eccs.min)
      import s.implicits._
      Seq((nV, nE, eccs.length.toLong, dia, rad,
          eccs.count(_ == dia).toLong, eccs.count(_ == rad).toLong))
        .toDF("n_nodes", "n_edges", "n_sources", "diameter_lb",
          "radius_ub", "n_peripheral", "n_central")
    }
  }

  /** Negative-binomial method-of-moments fit of orders-per-customer:
    * r = m²/(v−m), p = m/v from exact integer moments (zero-order
    * customers included via left join — the classic count-model
    * pitfall). The dispersion index v/m is the overdispersion
    * diagnostic deciding Poisson vs NB. All divisions are pinned
    * doubles over exact sums, milli-quantized. */
  def q474: Q = {
    val m = "CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)"
    val v = s"CAST(q AS DOUBLE) / CAST(n AS DOUBLE) - ($m) * ($m)"
    def quant(e: String, name: String) =
      s"CAST(floor(CAST($e AS DECIMAL(28,6)) * 1000) AS BIGINT) AS $name"
    // degenerate-moment guards, SHARED TEXT both engines: a zero
    // variance (every customer the same count — the sf0.001 corpus)
    // or v = m (equidispersed) zeroes a denominator; Spark ANSI
    // throws DIVIDE_BY_ZERO where DuckDB floats to inf — both must
    // state the NULL explicitly
    def safeDiv(num: String, den: String) =
      s"CASE WHEN ($den) = 0 THEN NULL ELSE ($num) / ($den) END"
    Q("q474_negbin_orders_fit",
      Some(s"""
        |WITH oc AS (
        |  SELECT c.c_custkey, count(o.o_orderkey) AS k
        |  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |  GROUP BY 1),
        |mo AS (SELECT count(*) AS n, sum(k) AS sx, sum(k * k) AS q FROM oc)
        |SELECT CAST(n AS BIGINT) AS n_customers,
        |       ${quant(m, "mean_milli")},
        |       ${quant(v, "var_milli")},
        |       ${quant(safeDiv(v, m), "dispersion_milli")},
        |       ${quant(safeDiv(s"($m) * ($m)", s"($v) - ($m)"), "r_milli")},
        |       ${quant(safeDiv(m, v), "p_milli")}
        |FROM mo
        |""".stripMargin)) { (s, dir) =>
      val oc = Tables.customer(s, dir).select(col("c_custkey"))
        .join(Tables.orders(s, dir)
          .select(col("o_custkey"), col("o_orderkey")),
          col("o_custkey") === col("c_custkey"), "left")
        .groupBy(col("c_custkey")).agg(count(col("o_orderkey")).as("k"))
      oc.agg(count(lit(1)).as("n"), sum(col("k")).as("sx"),
          sum(col("k") * col("k")).as("q"))
        .select(col("n").as("n_customers"),
          expr(quant(m, "mean_milli")),
          expr(quant(v, "var_milli")),
          expr(quant(safeDiv(v, m), "dispersion_milli")),
          expr(quant(safeDiv(s"($m) * ($m)", s"($v) - ($m)"), "r_milli")),
          expr(quant(safeDiv(m, v), "p_milli")))
    }
  }

  /** Simpson's-paradox audit of "deep discounts (≥5%) raise return
    * rates": the aggregate permille difference vs the same contrast
    * within every brand, counting brands whose sign REVERSES the
    * aggregate and naming the strongest reversal — the stratification
    * check that catches confounded aggregate claims. Brands missing
    * either discount class are out of contrast domain (stated). Exact
    * permille integers throughout. */
  def q475: Q = Q(
    "q475_simpson_discount_returns",
    Some("""
      |WITH l AS (
      |  SELECT p.p_brand AS brand,
      |         CASE WHEN floor(l.l_discount * 100 + 0.5) >= 5
      |              THEN 1 ELSE 0 END AS hi,
      |         CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
      |ov AS (
      |  SELECT (1000 * sum(CASE WHEN hi = 1 THEN y ELSE 0 END))
      |           // sum(hi) AS rh,
      |         (1000 * sum(CASE WHEN hi = 0 THEN y ELSE 0 END))
      |           // sum(1 - hi) AS rl
      |  FROM l),
      |br AS (
      |  SELECT brand,
      |         (1000 * sum(CASE WHEN hi = 1 THEN y ELSE 0 END))
      |           // sum(hi) AS rh,
      |         (1000 * sum(CASE WHEN hi = 0 THEN y ELSE 0 END))
      |           // sum(1 - hi) AS rl
      |  FROM l GROUP BY 1
      |  HAVING sum(hi) > 0 AND sum(1 - hi) > 0),
      |sg AS (SELECT CASE WHEN rh - rl > 0 THEN 1
      |              WHEN rh - rl < 0 THEN -1 ELSE 0 END AS s,
      |              rh - rl AS diff FROM ov),
      |rev AS (
      |  SELECT br.brand, (br.rh - br.rl) AS bdiff,
      |         sg.s * (br.rh - br.rl) AS oriented
      |  FROM br CROSS JOIN sg),
      |top AS (SELECT brand, bdiff FROM rev
      |        ORDER BY oriented, brand LIMIT 1)
      |SELECT CAST(sg.diff AS BIGINT) AS overall_diff_milli,
      |       CAST((SELECT count(*) FROM rev) AS BIGINT) AS n_brands,
      |       CAST((SELECT sum(CASE WHEN oriented < 0 THEN 1 ELSE 0 END)
      |             FROM rev) AS BIGINT) AS n_reversed,
      |       top.brand AS strongest_reversal_brand,
      |       CAST(top.bdiff AS BIGINT) AS strongest_reversal_diff_milli
      |FROM sg CROSS JOIN top
      |""".stripMargin)) { (s, dir) =>
    val l = Tables.lineitem(s, dir)
      .join(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand").as("brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("brand"),
        when(expr("floor(l_discount * 100 + 0.5) >= 5"), 1L)
          .otherwise(0L).as("hi"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
      .materialize()
    def rates(df: org.apache.spark.sql.RelationalGroupedDataset) =
      df.agg(
        expr("(1000 * sum(CASE WHEN hi = 1 THEN y ELSE 0 END)) div sum(hi)")
          .as("rh"),
        expr("(1000 * sum(CASE WHEN hi = 0 THEN y ELSE 0 END))" +
          " div sum(1 - hi)").as("rl"),
        sum(col("hi")).as("nh"),
        sum(lit(1L) - col("hi")).as("nl"))
    val ov = rates(l.groupBy())
      .select((col("rh") - col("rl")).as("diff"),
        when(col("rh") > col("rl"), 1L)
          .when(col("rh") < col("rl"), -1L).otherwise(0L).as("s"))
    val br = rates(l.groupBy(col("brand")))
      .where(col("nh") > 0 && col("nl") > 0)
      .select(col("brand"), (col("rh") - col("rl")).as("bdiff"))
    val rev = br.crossJoin(broadcast(ov))
      .select(col("brand"), col("bdiff"),
        (col("s") * col("bdiff")).as("oriented"), col("diff"))
      .materialize() // brand dim
    val agg = rev.agg(count(lit(1)).as("n_brands"),
      sum(when(col("oriented") < 0, 1L).otherwise(0L)).as("n_reversed"),
      max(col("diff")).as("overall_diff_milli"))
    val top = rev.orderBy(col("oriented"), col("brand")).limit(1)
      .select(col("brand").as("strongest_reversal_brand"),
        col("bdiff").as("strongest_reversal_diff_milli"))
    agg.crossJoin(broadcast(top))
      .select(col("overall_diff_milli"), col("n_brands"),
        col("n_reversed"), col("strongest_reversal_brand"),
        col("strongest_reversal_diff_milli"))
  }
}
