package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-8 dispersion wave: Juilland's D corpus dispersion per token,
  * bigram top-1 predictability, Tukey median polish of the
  * brand×region revenue matrix, Page's trend test across quarters
  * within regions, and the Hoover (Robin Hood) inequality index over
  * customers. Matrix/median passes live on the brand/region dims;
  * the one fact-scaled frame (per-customer revenue) is a single hash
  * aggregate plus an exact integer sum. */
object DispersionQueries {

  val all: Seq[Q] = Seq(q621, q622, q623, q624, q625)

  /** Juilland's D dispersion of each vocabulary token across sources:
    * per-source ppm rates (integer floor), population CV over the
    * source dim, D = 1 − CV/√(k−1) — the "is this token everywhere or
    * one subcorpus's tic" measure mixture design reads before
    * upweighting a source. Vocab and source dims are both bounded. */
  def q621: Q = Q(
    "q621_juilland_dispersion",
    Some(s"""
      |WITH t AS (
      |  SELECT source, unnest(${PipelineQueries.sqlTokens("text")}) AS w
      |  FROM documents WHERE text IS NOT NULL),
      |ns AS (SELECT source, count(*) AS n FROM t GROUP BY 1),
      |cs AS (SELECT source, w, count(*) AS c FROM t GROUP BY 1, 2),
      |fs AS (
      |  SELECT cs.w, (1000000 * cs.c) // ns.n AS f
      |  FROM cs JOIN ns ON cs.source = ns.source),
      |ag AS (
      |  SELECT w, count(*) AS k, sum(f) AS s,
      |         sum(CAST(f AS HUGEINT) * f) AS q
      |  FROM fs GROUP BY 1
      |  HAVING count(*) >= 2),
      |ct AS (SELECT w, count(*) AS total FROM t GROUP BY 1)
      |SELECT ag.w AS token, CAST(ct.total AS BIGINT) AS n_occurrences,
      |       CAST(ag.k AS BIGINT) AS n_sources,
      |       CAST(floor((1.0 - sqrt(CAST(ag.k * ag.q - ag.s * ag.s
      |           AS DOUBLE)) / CAST(ag.s AS DOUBLE)
      |           / sqrt(CAST(ag.k - 1 AS DOUBLE))) * 1000.0) AS BIGINT)
      |         AS d_milli
      |FROM ag JOIN ct ON ag.w = ct.w
      |ORDER BY token
      |""".stripMargin)) { (s, dir) =>
    val t = Tables.documents(s, dir)
      .where(col("text").isNotNull)
      .select(col("source"),
        explode(graft.text.TextAnalysis.tokens(col("text"))).as("w"))
      .materialize() // source sizes, per-source counts, totals
    val ns = t.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val cs = t.groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
    val fs = cs.join(broadcast(ns), "source")
      .select(col("w"), expr("(1000000 * c) div n").as("f"))
    // a single-source token makes D = 1 - 0/0 (NaN -> ANSI cast
    // abort): the dispersion of a one-source token is undefined by
    // the formula, so both engines DROP it (HAVING k >= 2)
    val ag = fs.groupBy(col("w"))
      .agg(count(lit(1)).as("k"), sum(col("f")).as("s"),
        sum(expr("CAST(f AS DECIMAL(38,0)) * f")).as("q"))
      .where(col("k") >= 2)
    val ct = t.groupBy(col("w")).agg(count(lit(1)).as("total"))
    ag.join(ct.withColumnRenamed("w", "cw"), col("w") === col("cw"))
      .select(col("w").as("token"), col("total").as("n_occurrences"),
        col("k").as("n_sources"),
        expr("CAST(floor((1.0 - sqrt(CAST(k * q - s * s AS DOUBLE))" +
          " / CAST(s AS DOUBLE) / sqrt(CAST(k - 1 AS DOUBLE)))" +
          " * 1000.0) AS BIGINT)").as("d_milli"))
      .orderBy(col("token"))
  }

  /** Bigram top-1 predictability of the corpus: for every prefix
    * token, the share of continuations the MAJORITY next token
    * captures — the ceiling accuracy of a bigram greedy decoder
    * (Σ_prefix max count / Σ counts, exact). The g₃-style "how
    * deterministic is my corpus" number behind memorization
    * debates. */
  def q622: Q = Q(
    "q622_bigram_top1_accuracy",
    Some(s"""
      |WITH d AS (
      |  SELECT ${PipelineQueries.sqlTokens("text")} AS toks
      |  FROM documents WHERE text IS NOT NULL),
      |b AS (
      |  SELECT unnest(list_transform(
      |           range(1, greatest(len(toks) - 1, 0) + 1),
      |           i -> {'w1': toks[i], 'w2': toks[i + 1]})) AS bg
      |  FROM d),
      |c AS (SELECT bg.w1 AS w1, bg.w2 AS w2, count(*) AS c
      |      FROM b GROUP BY 1, 2),
      |m AS (SELECT w1, max(c) AS mc, sum(c) AS tc FROM c GROUP BY 1),
      |ag AS (SELECT count(*) AS n_prefixes, sum(tc) AS n_bigrams,
      |              sum(mc) AS n_top1 FROM m)
      |SELECT CAST(n_prefixes AS BIGINT) AS n_prefixes,
      |       CAST(n_bigrams AS BIGINT) AS n_bigrams,
      |       CAST((1000000 * n_top1) // n_bigrams AS BIGINT) AS top1_ppm
      |FROM ag
      |""".stripMargin)) { (s, dir) =>
    val d = Tables.documents(s, dir)
      .where(col("text").isNotNull)
      .select(graft.text.TextAnalysis.tokens(col("text")).as("toks"))
      // sequence(1, 0) DESCENDS in Spark (the Bpe.scala:24 pitfall):
      // a <=1-token doc would fabricate out-of-range indices and ANSI
      // would crash — such docs contribute no bigrams in BOTH engines,
      // so the filter is semantics-neutral (oracle's range(1,1) = [])
      .where(size(col("toks")) >= 2)
    val b = d.select(explode(expr(
      "transform(sequence(1, greatest(size(toks) - 1, 0))," +
        " i -> named_struct('w1', toks[i - 1], 'w2', toks[i]))"))
      .as("bg"))
    val c = b.groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("c"))
    c.groupBy(col("w1")).agg(max(col("c")).as("mc"), sum(col("c")).as("tc"))
      .agg(count(lit(1)).as("n_prefixes"), sum(col("tc")).as("n_bigrams"),
        sum(col("mc")).as("n_top1"))
      .select(col("n_prefixes"), col("n_bigrams"),
        expr("(1000000 * n_top1) div n_bigrams").as("top1_ppm"))
  }

  /** Tukey median polish of the brand×region revenue matrix (two
    * full row/column sweeps on exact cent medians — the lower-median
    * order statistic, identical target rank in both engines): the
    * additive brand + region decomposition a mean-based two-way fit
    * would let outliers bend. Outputs the region (column) effects and
    * the residual L1 mass. All sweeps live on the 25×5 dim. */
  def q623: Q = {
    def medSql(src: String, part: String, v: String, out: String) = s"""
      |$out AS (
      |  SELECT $part, max(CASE WHEN rn = (500 * n + 999) // 1000
      |                    THEN $v END) AS m
      |  FROM (SELECT $part, $v,
      |               row_number() OVER (PARTITION BY $part ORDER BY $v)
      |                 AS rn,
      |               count(*) OVER (PARTITION BY $part) AS n
      |        FROM $src) r
      |  GROUP BY 1)""".stripMargin
    Q("q623_median_polish",
      Some(s"""
        |WITH m0 AS (
        |  SELECT p.p_brand AS b, n.n_regionkey AS rg,
        |         CAST(sum(CAST(l.l_extendedprice * 100 AS HUGEINT))
        |              AS BIGINT) AS v
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  GROUP BY 1, 2),
        |${medSql("m0", "b", "v", "rm1")},
        |r1 AS (SELECT m0.b, m0.rg, m0.v - rm1.m AS v
        |       FROM m0 JOIN rm1 ON m0.b = rm1.b),
        |${medSql("r1", "rg", "v", "cm1")},
        |r2 AS (SELECT r1.b, r1.rg, r1.v - cm1.m AS v
        |       FROM r1 JOIN cm1 ON r1.rg = cm1.rg),
        |${medSql("r2", "b", "v", "rm2")},
        |r3 AS (SELECT r2.b, r2.rg, r2.v - rm2.m AS v
        |       FROM r2 JOIN rm2 ON r2.b = rm2.b),
        |${medSql("r3", "rg", "v", "cm2")},
        |r4 AS (SELECT r3.b, r3.rg, r3.v - cm2.m AS v
        |       FROM r3 JOIN cm2 ON r3.rg = cm2.rg),
        |res AS (SELECT sum(abs(v)) AS l1 FROM r4)
        |SELECT CAST(cm1.rg AS BIGINT) AS region_key,
        |       CAST(cm1.m + cm2.m AS BIGINT) AS col_effect_cents,
        |       CAST(res.l1 AS BIGINT) AS resid_l1_cents
        |FROM cm1 JOIN cm2 ON cm1.rg = cm2.rg CROSS JOIN res
        |ORDER BY region_key
        |""".stripMargin)) { (s, dir) =>
      val m0 = Tables.lineitem(s, dir)
        .join(Tables.part(s, dir)
          .select(col("p_partkey"), col("p_brand").as("b")),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.supplier(s, dir)
          .select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(Tables.nation(s, dir)
          .select(col("n_nationkey"), col("n_regionkey").as("rg")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("b"), col("rg"))
        .agg(expr("CAST(sum(CAST(l_extendedprice * 100 AS DECIMAL(38,0)))" +
          " AS BIGINT)").as("v"))
        .materialize() // the 125-cell matrix every sweep reads
      def med(df: DataFrame, part: String): DataFrame =
        graft.operators.OrderStats.quantilesDisc(df, Seq(part), "v",
            Seq(500))
          .select(col(part).as(s"__$part"), col("value").as("m"))
      def sweep(df: DataFrame, part: String): (DataFrame, DataFrame) = {
        val m = med(df, part).materialize(truncate = true)
        (df.join(broadcast(m), col(part) === col(s"__$part"))
          .select(col("b"), col("rg"), (col("v") - col("m")).as("v"))
          .materialize(truncate = true), m)
      }
      val (r1, _) = sweep(m0, "b")
      val (r2, cm1) = sweep(r1, "rg")
      val (r3, _) = sweep(r2, "b")
      val (r4, cm2) = sweep(r3, "rg")
      val res = r4.agg(sum(abs(col("v"))).as("l1"))
      cm1.select(col("__rg").as("rg"), col("m").as("m1"))
        .join(cm2.select(col("__rg").as("rg2"), col("m").as("m2")),
          col("rg") === col("rg2"))
        .crossJoin(broadcast(res))
        .select(col("rg").cast("long").as("region_key"),
          (col("m1") + col("m2")).as("col_effect_cents"),
          col("l1").cast("long").as("resid_l1_cents"))
        .orderBy(col("region_key"))
    }
  }

  /** Page's trend test for a MONOTONE revenue trend across the last 8
    * quarters, blocked by region: within each region the quarters are
    * ranked by revenue (deterministic (value, quarter) tie-break), and
    * L = Σ_j j·R_j weights late quarters by their rank sums.
    * χ² = (12L − 3bk(k+1)²)²/(b·k²(k+1)(k²−1)) — exact integers to
    * the last division. The ordered-alternative test a Friedman/
    * Kendall-W omnibus can't give you. */
  def q624: Q = {
    val (qLo, qHi) = (7999L, 8006L)
    Q("q624_page_trend_test",
      Some(s"""
        |WITH rq AS (
        |  SELECT n.n_regionkey AS rg,
        |         year(o.o_orderdate) * 4
        |           + (month(o.o_orderdate) - 1) // 3 AS q,
        |         sum(CAST(o.o_totalprice * 100 AS HUGEINT)) AS v
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  WHERE year(o.o_orderdate) * 4
        |          + (month(o.o_orderdate) - 1) // 3 BETWEEN $qLo AND $qHi
        |  GROUP BY 1, 2),
        |rk AS (
        |  SELECT rg, q, row_number() OVER (PARTITION BY rg
        |           ORDER BY v, q) AS r
        |  FROM rq),
        |l AS (
        |  SELECT sum((q - $qLo + 1) * r) AS lstat,
        |         count(DISTINCT rg) AS b, count(DISTINCT q) AS k
        |  FROM rk)
        |SELECT CAST(lstat AS BIGINT) AS l_stat,
        |       CAST(b * k * (k + 1) * (k + 1) / 4 AS BIGINT) AS e_l,
        |       CAST(floor(CAST((12 * lstat - 3 * b * k * (k + 1) * (k + 1))
        |           * (12 * lstat - 3 * b * k * (k + 1) * (k + 1))
        |           AS DOUBLE)
        |         / CAST(b * k * k * (k + 1) * (k * k - 1) AS DOUBLE)
        |         * 1000.0) AS BIGINT) AS chi2_milli
        |FROM l
        |""".stripMargin)) { (s, dir) =>
      val rq = Tables.orders(s, dir)
        .join(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(s, dir)
          .select(col("n_nationkey"), col("n_regionkey").as("rg")),
          col("c_nationkey") === col("n_nationkey"))
        .withColumn("q", expr("CAST(year(o_orderdate) * 4" +
          " + (month(o_orderdate) - 1) div 3 AS BIGINT)"))
        .where(col("q").between(qLo, qHi))
        .groupBy(col("rg"), col("q"))
        .agg(sum(expr("CAST(o_totalprice * 100 AS DECIMAL(38,0))"))
          .as("v"))
      val rk = rq.withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("rg")).orderBy(col("v"), col("q"))))
      rk.agg(sum((col("q") - qLo + 1) * col("r")).as("lstat"),
          countDistinct(col("rg")).as("b"),
          countDistinct(col("q")).as("k"))
        .select(col("lstat").as("l_stat"),
          expr("CAST(b * k * (k + 1) * (k + 1) / 4 AS BIGINT)")
            .as("e_l"),
          expr("CAST(floor(CAST((12 * lstat - 3 * b * k * (k + 1)" +
            " * (k + 1)) * (12 * lstat - 3 * b * k * (k + 1) * (k + 1))" +
            " AS DOUBLE) / CAST(b * k * k * (k + 1) * (k * k - 1)" +
            " AS DOUBLE) * 1000.0) AS BIGINT)").as("chi2_milli"))
    }
  }

  /** Hoover (Robin Hood) index of customer revenue inequality: the
    * share of total revenue that would have to move between customers
    * to equalize — ½ Σ|y_i/T − 1/n| = Σ|n·y_i − T|/(2nT). Zero-order
    * customers are real zeros via the left join (the classic
    * inequality-understating omission). One fact pass, one exact
    * integer sum over the customer dim, one pinned division. */
  def q625: Q = Q(
    "q625_hoover_index",
    Some("""
      |WITH cy AS (
      |  SELECT c.c_custkey,
      |         coalesce(sum(CAST(o.o_totalprice * 100 AS HUGEINT)), 0)
      |           AS y
      |  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      |  GROUP BY 1),
      |tt AS (SELECT count(*) AS n, sum(y) AS t FROM cy),
      |nm AS (SELECT sum(abs(CAST(tt.n AS HUGEINT) * y - tt.t)) AS num
      |       FROM cy CROSS JOIN tt)
      |SELECT CAST(tt.n AS BIGINT) AS n_customers,
      |       CAST(tt.t AS BIGINT) AS total_cents,
      |       CAST(floor(CAST(nm.num AS DOUBLE)
      |         / (2.0 * CAST(tt.n AS DOUBLE) * CAST(tt.t AS DOUBLE))
      |         * 1000000.0) AS BIGINT) AS hoover_micro
      |FROM nm CROSS JOIN tt
      |""".stripMargin)) { (s, dir) =>
    val cy = Tables.customer(s, dir).select(col("c_custkey"))
      .join(Tables.orders(s, dir).select(col("o_custkey"),
        expr("CAST(o_totalprice * 100 AS DECIMAL(38,0))").as("p")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(coalesce(sum(col("p")), lit(0)).as("y"))
      .materialize() // totals AND the deviation sum
    val tt = cy.agg(count(lit(1)).as("n"), sum(col("y")).as("t"))
    cy.crossJoin(broadcast(tt))
      .agg(sum(abs(col("n").cast("decimal(38,0)") * col("y") - col("t")))
        .as("num"), max(col("n")).as("n"), max(col("t")).as("t"))
      .select(col("n").as("n_customers"),
        col("t").cast("long").as("total_cents"),
        expr("CAST(floor(CAST(num AS DOUBLE)" +
          " / (2.0 * CAST(n AS DOUBLE) * CAST(t AS DOUBLE))" +
          " * 1000000.0) AS BIGINT)").as("hoover_micro"))
  }
}
