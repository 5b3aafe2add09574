package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-8 comparison wave: indirect standardization (SMR) of region
  * return rates, funnel-plot supplier outliers, Yuen's trimmed-mean
  * test between two regions, partial correlation controlling for a
  * third variable, and Lin's concordance correlation on the
  * two-measure order-value pair. Rank-based trimming rides
  * bucket-parallel globalRankCum with region partitions; everything
  * else is exact moments + pinned finals. */
object ComparisonQueries {

  val all: Seq[Q] = Seq(q626, q627, q628, q629, q630)

  /** Indirectly standardized return ratios (SMR) per customer region:
    * expected returns = Σ_brand region-volume × OVERALL brand return
    * rate; SMR = observed/expected — "after adjusting for WHAT this
    * region buys, does it return more?" Per-brand expected terms are
    * micro-quantized through one shared pinned expression, summed
    * exactly. The q618 decomposition's per-region sibling. */
  def q626: Q = Q(
    "q626_indirect_standardization",
    Some("""
      |WITH lb AS (
      |  SELECT n.n_regionkey AS rg, p.p_brand AS brand,
      |         count(*) AS n,
      |         sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS r
      |  FROM lineitem l
      |  JOIN part p ON l.l_partkey = p.p_partkey
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  GROUP BY 1, 2),
      |br AS (SELECT brand, sum(n) AS tn, sum(r) AS tr FROM lb GROUP BY 1),
      |ex AS (
      |  SELECT lb.rg,
      |         sum(lb.r) AS obs,
      |         sum(CAST(floor(CAST(lb.n AS DOUBLE) * br.tr / br.tn
      |             * 1000000.0) AS BIGINT)) AS exp_micro
      |  FROM lb JOIN br ON lb.brand = br.brand
      |  GROUP BY 1)
      |SELECT CAST(rg AS BIGINT) AS region_key,
      |       CAST(obs AS BIGINT) AS observed_returns,
      |       CAST(exp_micro // 1000000 AS BIGINT) AS expected_returns,
      |       CAST(floor(CAST(obs AS DOUBLE)
      |         / (CAST(exp_micro AS DOUBLE) / 1000000.0) * 1000.0)
      |         AS BIGINT) AS smr_milli
      |FROM ex ORDER BY region_key
      |""".stripMargin)) { (s, dir) =>
    val lb = Tables.lineitem(s, dir)
      .join(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand").as("brand")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_regionkey").as("rg")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("rg"), col("brand"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("r"))
      .materialize() // region×brand dim feeds brand totals AND SMRs
    val br = lb.groupBy(col("brand"))
      .agg(sum(col("n")).as("tn"), sum(col("r")).as("tr"))
    lb.join(broadcast(br.withColumnRenamed("brand", "bb")),
        col("brand") === col("bb"))
      .groupBy(col("rg"))
      .agg(sum(col("r")).as("obs"),
        sum(expr("CAST(floor(CAST(n AS DOUBLE) * tr / tn * 1000000.0)" +
          " AS BIGINT)")).as("exp_micro"))
      .select(col("rg").cast("long").as("region_key"),
        col("obs").as("observed_returns"),
        expr("exp_micro div 1000000").as("expected_returns"),
        expr("CAST(floor(CAST(obs AS DOUBLE)" +
          " / (CAST(exp_micro AS DOUBLE) / 1000000.0) * 1000.0)" +
          " AS BIGINT)").as("smr_milli"))
      .orderBy(col("region_key"))
  }

  /** Funnel-plot outliers: each supplier's return proportion against
    * the pooled rate with volume-dependent 3σ binomial limits —
    * z = (p̂ − p₀)·√n/√(p₀(1−p₀)); the top-10 |z| suppliers via
    * orderBy().limit (the supplier dim GROWS with sf — never a global
    * window), plus the outside-3σ count. Small-volume suppliers stop
    * looking "extreme" exactly as the funnel narrows. */
  def q627: Q = {
    val z = "(CAST(r AS DOUBLE) / n - p0) * sqrt(CAST(n AS DOUBLE))" +
      " / sqrt(p0 * (1.0 - p0))"
    Q("q627_funnel_plot_suppliers",
      Some(s"""
        |WITH sp AS (
        |  SELECT l_suppkey AS sk, count(*) AS n,
        |         sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS r
        |  FROM lineitem GROUP BY 1),
        |tt AS (SELECT CAST(sum(r) AS DOUBLE) / sum(n) AS p0 FROM sp),
        |zz AS (SELECT sk, n, r, $z AS z FROM sp CROSS JOIN tt),
        |oc AS (SELECT count(*) AS n_outside FROM zz
        |       WHERE z > 3.0 OR z < -3.0)
        |SELECT CAST(sk AS BIGINT) AS suppkey, CAST(n AS BIGINT) AS n_lines,
        |       CAST(r AS BIGINT) AS n_returned,
        |       CAST(floor(z * 1000.0) AS BIGINT) AS z_milli,
        |       CAST(oc.n_outside AS BIGINT) AS n_outside_3sigma
        |FROM zz CROSS JOIN oc
        |ORDER BY abs(z) DESC, sk LIMIT 10
        |""".stripMargin)) { (s, dir) =>
      val sp = Tables.lineitem(s, dir)
        .groupBy(col("l_suppkey").as("sk"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .as("r"))
      val tt = sp.agg(
        expr("CAST(sum(r) AS DOUBLE) / sum(n)").as("p0"))
      val zz = sp.crossJoin(broadcast(tt))
        .withColumn("z", expr(z))
        .materialize() // the outside-count AND the top-10 read it
      val oc = zz.where(col("z") > 3.0 || col("z") < -3.0)
        .agg(count(lit(1)).as("n_outside"))
      zz.crossJoin(broadcast(oc))
        .orderBy(abs(col("z")).desc, col("sk"))
        .limit(10)
        .select(col("sk").as("suppkey"), col("n").as("n_lines"),
          col("r").as("n_returned"),
          expr("CAST(floor(z * 1000.0) AS BIGINT)").as("z_milli"),
          col("n_outside").as("n_outside_3sigma"))
    }
  }

  /** Yuen's trimmed-mean test of order value between region-0 and
    * region-1 customers (10% trim each tail): trim bounds are exact
    * per-group ranks (bucket-parallel globalRankCum with partCols —
    * two fact-sized groups never sort on one partition), trimmed and
    * winsorized moments are exact integers, t² is one pinned chain.
    * The outlier-robust two-sample test plain Welch is not. */
  def q628: Q = Q(
    "q628_yuen_trimmed_t",
    Some("""
      |WITH oc AS (
      |  SELECT n.n_regionkey AS rg, o.o_orderkey AS id,
      |         CAST(o.o_totalprice * 100 AS HUGEINT) AS y
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  WHERE n.n_regionkey IN (0, 1)),
      |rk AS (
      |  SELECT rg, y,
      |         row_number() OVER (PARTITION BY rg ORDER BY y, id) AS rn,
      |         count(*) OVER (PARTITION BY rg) AS n
      |  FROM oc),
      |tw AS MATERIALIZED (
      |  SELECT rg, n, n // 10 AS g,
      |         CASE WHEN rn <= n // 10 THEN 'lo'
      |              WHEN rn > n - n // 10 THEN 'hi'
      |              ELSE 'mid' END AS part, y, rn
      |  FROM rk),
      |bounds AS (
      |  SELECT rg, min(CASE WHEN part = 'mid' THEN y END) AS ylo,
      |         max(CASE WHEN part = 'mid' THEN y END) AS yhi
      |  FROM tw GROUP BY 1),
      |wz AS (
      |  SELECT tw.rg, tw.n, tw.g,
      |         CASE WHEN tw.part = 'lo' THEN b.ylo
      |              WHEN tw.part = 'hi' THEN b.yhi ELSE tw.y END AS w,
      |         CASE WHEN tw.part = 'mid' THEN tw.y END AS t
      |  FROM tw JOIN bounds b ON tw.rg = b.rg),
      |mo AS (
      |  SELECT rg, max(n) AS n, max(g) AS g,
      |         count(t) AS h, sum(t) AS st,
      |         sum(w) AS sw, sum(w * w) AS qw
      |  FROM wz GROUP BY 1),
      |st AS MATERIALIZED (
      |  SELECT rg, n, g, h, st, sw, qw,
      |         CAST(st AS DOUBLE) / h AS tmean,
      |         CAST(CAST(n AS HUGEINT) * qw - sw * sw AS DOUBLE)
      |           / CAST(n AS DOUBLE) / (h - 1) / h AS se2
      |  FROM mo)
      |SELECT CAST(a.h AS BIGINT) AS h0, CAST(b.h AS BIGINT) AS h1,
      |       CAST(floor(a.tmean) AS BIGINT) AS tmean0_cents,
      |       CAST(floor(b.tmean) AS BIGINT) AS tmean1_cents,
      |       CAST(floor((a.tmean - b.tmean) * (a.tmean - b.tmean)
      |         / (a.se2 + b.se2) * 1000.0) AS BIGINT) AS t2_milli
      |FROM st a CROSS JOIN st b WHERE a.rg = 0 AND b.rg = 1
      |""".stripMargin)) { (s, dir) =>
    val oc = Tables.orders(s, dir)
      .join(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_regionkey").as("rg")),
        col("c_nationkey") === col("n_nationkey"))
      .where(col("rg").isin(0, 1))
      .select(col("rg"), col("o_orderkey").as("id"),
        expr("CAST(o_totalprice * 100 AS DECIMAL(38,0))").as("y"))
    // per-group rank, bucket-parallel: partCols = region, $100 buckets
    val rk = graft.dedup.SortedNeighborhood.globalRankCum(
        oc.withColumn("__bkt", expr("CAST(y AS BIGINT) div 10000")),
        idCol = "id", bucketCol = "__bkt", tieCols = Seq("y"),
        partCols = Seq("rg"))
      .withColumnRenamed("__rank", "rn")
    val nn = rk.groupBy(col("rg")).agg(count(lit(1)).as("n"))
    val tw = rk.join(broadcast(nn.withColumnRenamed("rg", "nrg")),
        col("rg") === col("nrg"))
      .select(col("rg"), col("n"), expr("n div 10").as("g"), col("y"),
        expr("CASE WHEN rn <= n div 10 THEN 'lo'" +
          " WHEN rn > n - n div 10 THEN 'hi' ELSE 'mid' END").as("part"))
      .materialize() // bounds AND winsorized moments read it
    val bounds = tw.groupBy(col("rg").as("brg"))
      .agg(min(when(col("part") === "mid", col("y"))).as("ylo"),
        max(when(col("part") === "mid", col("y"))).as("yhi"))
    val mo = tw.join(broadcast(bounds), col("rg") === col("brg"))
      .select(col("rg"), col("n"), col("g"),
        when(col("part") === "lo", col("ylo"))
          .when(col("part") === "hi", col("yhi"))
          .otherwise(col("y")).as("w"),
        when(col("part") === "mid", col("y")).as("t"))
      .groupBy(col("rg"))
      .agg(max(col("n")).as("n"), max(col("g")).as("g"),
        count(col("t")).as("h"), sum(col("t")).as("st"),
        sum(col("w")).as("sw"), sum(col("w") * col("w")).as("qw"))
    val st = mo.select(col("rg"), col("h"),
      expr("CAST(st AS DOUBLE) / h").as("tmean"),
      expr("CAST(CAST(n AS DECIMAL(38,0)) * qw - sw * sw AS DOUBLE)" +
        " / CAST(n AS DOUBLE) / (h - 1) / h").as("se2"))
    st.where(col("rg") === 0)
      .select(col("h").as("h0"), col("tmean").as("tm0"),
        col("se2").as("se20"))
      .crossJoin(broadcast(st.where(col("rg") === 1)
        .select(col("h").as("h1"), col("tmean").as("tm1"),
          col("se2").as("se21"))))
      .select(col("h0"), col("h1"),
        expr("CAST(floor(tm0) AS BIGINT)").as("tmean0_cents"),
        expr("CAST(floor(tm1) AS BIGINT)").as("tmean1_cents"),
        expr("CAST(floor((tm0 - tm1) * (tm0 - tm1) / (se20 + se21)" +
          " * 1000.0) AS BIGINT)").as("t2_milli"))
  }

  /** Partial correlation of line price and quantity CONTROLLING for
    * discount: r_xy·z from the three pairwise correlations, all from
    * one pass of exact integer moments — does the price–quantity
    * relation survive once the discount channel is held fixed? */
  def q629: Q = {
    def rr(sab: String, sa: String, sb: String) =
      s"(CAST($sab AS DOUBLE) / sqrt(CAST($sa AS DOUBLE))" +
        s" / sqrt(CAST($sb AS DOUBLE)))"
    val rxy = rr("sxy", "sxx", "syy")
    val rxz = rr("sxz", "sxx", "szz")
    val ryz = rr("syz", "syy", "szz")
    Q("q629_partial_correlation",
      Some(s"""
        |WITH l AS (
        |  SELECT CAST(floor(l_extendedprice) AS BIGINT) AS x,
        |         CAST(floor(l_quantity + 0.5) AS BIGINT) AS y,
        |         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS z
        |  FROM lineitem),
        |mo AS (
        |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy, sum(z) AS sz,
        |         sum(CAST(x AS HUGEINT) * x) AS qx,
        |         sum(CAST(y AS HUGEINT) * y) AS qy,
        |         sum(CAST(z AS HUGEINT) * z) AS qz,
        |         sum(CAST(x AS HUGEINT) * y) AS qxy,
        |         sum(CAST(x AS HUGEINT) * z) AS qxz,
        |         sum(CAST(y AS HUGEINT) * z) AS qyz
        |  FROM l),
        |cs AS (
        |  SELECT n,
        |    CAST(n AS HUGEINT) * qx - CAST(sx AS HUGEINT) * sx AS sxx,
        |    CAST(n AS HUGEINT) * qy - CAST(sy AS HUGEINT) * sy AS syy,
        |    CAST(n AS HUGEINT) * qz - CAST(sz AS HUGEINT) * sz AS szz,
        |    CAST(n AS HUGEINT) * qxy - CAST(sx AS HUGEINT) * sy AS sxy,
        |    CAST(n AS HUGEINT) * qxz - CAST(sx AS HUGEINT) * sz AS sxz,
        |    CAST(n AS HUGEINT) * qyz - CAST(sy AS HUGEINT) * sz AS syz
        |  FROM mo)
        |SELECT CAST(n AS BIGINT) AS n_lines,
        |       CAST(floor($rxy * 1000000.0) AS BIGINT) AS r_xy_micro,
        |       CAST(floor(($rxy - $rxz * $ryz)
        |         / sqrt((1.0 - $rxz * $rxz) * (1.0 - $ryz * $ryz))
        |         * 1000000.0) AS BIGINT) AS r_xy_given_z_micro
        |FROM cs
        |""".stripMargin)) { (s, dir) =>
      val l = Tables.lineitem(s, dir).select(
        expr("CAST(floor(l_extendedprice) AS BIGINT)").as("x"),
        expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("y"),
        expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)").as("z"))
      l.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("z")).as("sz"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("qx"),
          sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("qy"),
          sum(expr("CAST(z AS DECIMAL(38,0)) * z")).as("qz"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("qxy"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * z")).as("qxz"),
          sum(expr("CAST(y AS DECIMAL(38,0)) * z")).as("qyz"))
        .select(col("n"),
          expr("CAST(n AS DECIMAL(38,0)) * qx" +
            " - CAST(sx AS DECIMAL(38,0)) * sx").as("sxx"),
          expr("CAST(n AS DECIMAL(38,0)) * qy" +
            " - CAST(sy AS DECIMAL(38,0)) * sy").as("syy"),
          expr("CAST(n AS DECIMAL(38,0)) * qz" +
            " - CAST(sz AS DECIMAL(38,0)) * sz").as("szz"),
          expr("CAST(n AS DECIMAL(38,0)) * qxy" +
            " - CAST(sx AS DECIMAL(38,0)) * sy").as("sxy"),
          expr("CAST(n AS DECIMAL(38,0)) * qxz" +
            " - CAST(sx AS DECIMAL(38,0)) * sz").as("sxz"),
          expr("CAST(n AS DECIMAL(38,0)) * qyz" +
            " - CAST(sy AS DECIMAL(38,0)) * sz").as("syz"))
        .select(col("n").as("n_lines"),
          expr(s"CAST(floor($rxy * 1000000.0) AS BIGINT)")
            .as("r_xy_micro"),
          expr(s"CAST(floor(($rxy - $rxz * $ryz)" +
            s" / sqrt((1.0 - $rxz * $rxz) * (1.0 - $ryz * $ryz))" +
            s" * 1000000.0) AS BIGINT)").as("r_xy_given_z_micro"))
    }
  }

  /** Lin's concordance correlation coefficient for the two order-value
    * measures (q599's pair): CCC = 2S_xy / (S_xx + S_yy + n(x̄−ȳ)²) —
    * penalizes location AND scale shifts, unlike Pearson's r which the
    * q600 Deming face shows can stay high while the measures disagree.
    * Exact n-scaled moments; one pinned final. */
  def q630: Q = Q(
    "q630_lins_ccc",
    Some("""
      |WITH ab AS (
      |  SELECT o.o_orderkey AS id,
      |         CAST(any_value(o.o_totalprice) * 100 AS HUGEINT) AS a,
      |         sum(CAST(l.l_extendedprice * 100 AS HUGEINT)) AS b
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |  GROUP BY 1),
      |mo AS (
      |  SELECT count(*) AS n, sum(a) AS sy, sum(b) AS sx,
      |         sum(a * a) AS qy, sum(b * b) AS qx, sum(a * b) AS qxy
      |  FROM ab),
      |cs AS (
      |  SELECT n,
      |    CAST(n AS HUGEINT) * qx - sx * sx AS sxx,
      |    CAST(n AS HUGEINT) * qy - sy * sy AS syy,
      |    CAST(n AS HUGEINT) * qxy - sx * sy AS sxy,
      |    sx - sy AS dxy
      |  FROM mo)
      |SELECT CAST(n AS BIGINT) AS n_orders,
      |       CAST(floor(CAST(sxy AS DOUBLE)
      |         / sqrt(CAST(sxx AS DOUBLE)) / sqrt(CAST(syy AS DOUBLE))
      |         * 1000000.0) AS BIGINT) AS pearson_micro,
      |       CAST(floor(2.0 * CAST(sxy AS DOUBLE)
      |         / (CAST(sxx AS DOUBLE) + CAST(syy AS DOUBLE)
      |            + CAST(dxy AS DOUBLE) * CAST(dxy AS DOUBLE))
      |         * 1000000.0) AS BIGINT) AS ccc_micro
      |FROM cs
      |""".stripMargin)) { (s, dir) =>
    val ab = Tables.orders(s, dir)
      .select(col("o_orderkey").as("id"),
        expr("CAST(o_totalprice * 100 AS DECIMAL(38,0))").as("a"))
      .join(Tables.lineitem(s, dir).select(col("l_orderkey"),
        expr("CAST(l_extendedprice * 100 AS DECIMAL(38,0))").as("lc")),
        col("id") === col("l_orderkey"))
      .groupBy(col("id"), col("a")).agg(sum(col("lc")).as("b"))
    ab.agg(count(lit(1)).as("n"), sum(col("a")).as("sy"),
        sum(col("b")).as("sx"), sum(col("a") * col("a")).as("qy"),
        sum(col("b") * col("b")).as("qx"),
        sum(col("a") * col("b")).as("qxy"))
      .select(col("n"),
        expr("CAST(n AS DECIMAL(38,0)) * qx - sx * sx").as("sxx"),
        expr("CAST(n AS DECIMAL(38,0)) * qy - sy * sy").as("syy"),
        expr("CAST(n AS DECIMAL(38,0)) * qxy - sx * sy").as("sxy"),
        (col("sx") - col("sy")).as("dxy"))
      .select(col("n").as("n_orders"),
        expr("CAST(floor(CAST(sxy AS DOUBLE)" +
          " / sqrt(CAST(sxx AS DOUBLE)) / sqrt(CAST(syy AS DOUBLE))" +
          " * 1000000.0) AS BIGINT)").as("pearson_micro"),
        expr("CAST(floor(2.0 * CAST(sxy AS DOUBLE)" +
          " / (CAST(sxx AS DOUBLE) + CAST(syy AS DOUBLE)" +
          " + CAST(dxy AS DOUBLE) * CAST(dxy AS DOUBLE))" +
          " * 1000000.0) AS BIGINT)").as("ccc_micro"))
  }
}
