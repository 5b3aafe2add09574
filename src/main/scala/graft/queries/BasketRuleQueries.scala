package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-10 association-rule wave on order baskets at the BRAND grain
  * (25-brand universe — the right itemset granularity: raw part keys
  * pair at support ≤5 on every sf): frequent brand pairs, rules
  * ranked by lift, conviction/leverage, negative associations, and
  * the basket-size pair-yield audit.
  *
  * Exactness: every metric is an exact scaled rational of integer
  * counts — conf = 1000·c_ab div c_a, lift = 1000·n·c_ab div
  * (c_a·c_b), leverage_ppm = 10⁶·(n·c_ab − c_a·c_b) div n²,
  * conviction = 1000·c_a·(n − c_b) div (n·(c_a − c_ab)) (NULL at
  * conf = 1). Products ride DECIMAL(38,0)/HUGEINT so the 100× head-
  * room is explicit.
  *
  * Scale: one lineitem scan joins the broadcast part dim and
  * collapses to the (order, brand) basket dim; pair expansion is the
  * [[SupplierGraph.edges]] sorted-set local fan-out (baskets hold ≤25
  * brands — bounded, no self-join); everything downstream lives on
  * the ≤300-pair rule dim. */
object BasketRuleQueries {

  val all: Seq[Q] = Seq(q1006, q1007, q1008, q1009, q1010)

  /** Basket/rule CTEs: bk(o, br), n (orders), ic(br, c), pc(a, b, c)
    * with a < b. */
  private def sqlBk: String = """
    |bk AS MATERIALIZED (
    |  SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS br
    |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    |nn AS (SELECT count(DISTINCT o) AS n FROM bk),
    |ic AS (SELECT br, count(*) AS c FROM bk GROUP BY 1),
    |pc AS MATERIALIZED (
    |  SELECT x.br AS a, y.br AS b, count(*) AS c
    |  FROM bk x JOIN bk y ON x.o = y.o AND x.br < y.br
    |  GROUP BY 1, 2)""".stripMargin

  /** Spark twin: (baskets bk(o, br), pair counts pc(a, b, c),
    * item counts ic(br, c), 1-row n). bk and pc are
    * [[graft.sources.SpineCache]] SPINE TABLES (VERDICT r10 #2): the
    * five queries of this wave previously each re-ran the lineitem
    * scan + brand join + distinct and the pair fan-out; now the wave
    * shares one fingerprint-keyed parquet build and every consumer
    * reads the (order, brand) dim / the ≤300-row pair dim. The DuckDB
    * oracle keeps the inline CTEs, so the gate proves cache ≡
    * from-scratch. */
  private def baskets(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val bk = graft.sources.SpineCache.table(s, dir, "brand_baskets",
      Seq("lineitem", "part")) {
      Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("pk"))
        .join(broadcast(Tables.part(s, dir)
          .select(col("p_partkey").as("pk"), col("p_brand").as("br"))),
          "pk")
        .select(col("o"), col("br")).distinct()
    }
    val n = bk.select(col("o")).distinct().agg(count(lit(1)).as("n"))
    val ic = bk.groupBy(col("br")).agg(count(lit(1)).as("c"))
    // ascending-sorted basket set → nested transform emits exactly the
    // a < b pairs, order-locally (the SupplierGraph.edges fan-out)
    val pc = graft.sources.SpineCache.table(s, dir, "brand_pairs",
      Seq("lineitem", "part")) {
      bk.groupBy(col("o"))
        .agg(sort_array(collect_set(col("br"))).as("bs"))
        .select(explode(flatten(expr(
          "transform(bs, (x, k) -> transform(slice(bs, k + 2, size(bs))," +
            " y -> struct(x AS a, y AS b)))"))).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
    }
    (bk, pc, ic, n)
  }

  /** Rule frame both directions with exact metrics attached:
    * (ante, cons, c_ab, c_a, c_b, n). */
  private def rules(s: SparkSession, dir: String): DataFrame = {
    val (_, pc, ic, n) = baskets(s, dir)
    val both = pc.select(col("a").as("ante"), col("b").as("cons"),
        col("c").as("cab"))
      .unionAll(pc.select(col("b").as("ante"), col("a").as("cons"),
        col("c").as("cab")))
    both
      .join(broadcast(ic.select(col("br").as("ante"), col("c").as("ca"))),
        "ante")
      .join(broadcast(ic.select(col("br").as("cons"), col("c").as("cb"))),
        "cons")
      .crossJoin(broadcast(n))
  }

  private def sqlRules: String = """
    |rl AS (
    |  SELECT r.ante, r.cons, r.cab, ia.c AS ca, ib.c AS cb, nn.n
    |  FROM (SELECT a AS ante, b AS cons, c AS cab FROM pc
    |        UNION ALL SELECT b, a, c FROM pc) r
    |  JOIN ic ia ON ia.br = r.ante JOIN ic ib ON ib.br = r.cons
    |  CROSS JOIN nn)""".stripMargin

  /** Top-10 frequent brand pairs by support. */
  def q1006: Q = Q(
    "q1006_frequent_brand_pairs",
    Some(s"""
      |WITH ${sqlBk}
      |SELECT a AS brand_a, b AS brand_b,
      |       CAST(c AS BIGINT) AS n_orders,
      |       CAST((1000000 * c) // (SELECT n FROM nn) AS BIGINT)
      |         AS support_ppm
      |FROM pc ORDER BY c DESC, a, b LIMIT 10
      |""".stripMargin)) { (s, dir) =>
    val (_, pc, _, n) = baskets(s, dir)
    pc.crossJoin(broadcast(n))
      .orderBy(col("c").desc, col("a"), col("b")).limit(10)
      .select(col("a").as("brand_a"), col("b").as("brand_b"),
        col("c").as("n_orders"),
        expr("CAST((1000000 * c) div n AS BIGINT)").as("support_ppm"))
  }

  /** Top-10 rules by lift. */
  def q1007: Q = Q(
    "q1007_rules_by_lift",
    Some(s"""
      |WITH ${sqlBk},
      |${sqlRules}
      |SELECT ante, cons,
      |       CAST(cab AS BIGINT) AS n_both,
      |       CAST((1000 * cab) // ca AS BIGINT) AS confidence_milli,
      |       CAST((1000 * CAST(n AS HUGEINT) * cab) // (ca * cb)
      |            AS BIGINT) AS lift_milli
      |FROM rl ORDER BY lift_milli DESC, ante, cons LIMIT 10
      |""".stripMargin)) { (s, dir) =>
    rules(s, dir)
      .select(col("ante"), col("cons"), col("cab").as("n_both"),
        expr("CAST((1000 * cab) div ca AS BIGINT)")
          .as("confidence_milli"),
        expr("CAST((1000 * CAST(n AS DECIMAL(38,0)) * cab)" +
          " div (ca * cb) AS BIGINT)").as("lift_milli"))
      .orderBy(col("lift_milli").desc, col("ante"), col("cons"))
      .limit(10)
  }

  /** Conviction and leverage for the strongest rules. */
  def q1008: Q = Q(
    "q1008_conviction_leverage",
    Some(s"""
      |WITH ${sqlBk},
      |${sqlRules}
      |SELECT ante, cons,
      |       CAST((1000000 * (CAST(n AS HUGEINT) * cab
      |            - CAST(ca AS HUGEINT) * cb))
      |            // (CAST(n AS HUGEINT) * n) AS BIGINT) AS leverage_ppm,
      |       CAST(CASE WHEN ca = cab THEN NULL
      |            ELSE (1000 * CAST(ca AS HUGEINT) * (n - cb))
      |                 // (CAST(n AS HUGEINT) * (ca - cab)) END
      |            AS BIGINT) AS conviction_milli
      |FROM rl
      |ORDER BY conviction_milli DESC NULLS LAST, leverage_ppm DESC,
      |         ante, cons
      |LIMIT 10
      |""".stripMargin)) { (s, dir) =>
    rules(s, dir)
      .select(col("ante"), col("cons"),
        expr("CAST((1000000 * (CAST(n AS DECIMAL(38,0)) * cab" +
          " - CAST(ca AS DECIMAL(38,0)) * cb))" +
          " div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)")
          .as("leverage_ppm"),
        expr("CAST(CASE WHEN ca = cab THEN NULL" +
          " ELSE (1000 * CAST(ca AS DECIMAL(38,0)) * (n - cb))" +
          " div (CAST(n AS DECIMAL(38,0)) * (ca - cab)) END AS BIGINT)")
          .as("conviction_milli"))
      .orderBy(col("conviction_milli").desc_nulls_last,
        col("leverage_ppm").desc, col("ante"), col("cons"))
      .limit(10)
  }

  /** Negative associations: the 10 most repelling pairs (lift < 1),
    * undirected (a < b orientation only). */
  def q1009: Q = Q(
    "q1009_negative_associations",
    Some(s"""
      |WITH ${sqlBk},
      |nl AS (
      |  SELECT pc.a, pc.b, pc.c,
      |         (1000 * CAST(nn.n AS HUGEINT) * pc.c)
      |           // (ia.c * ib.c) AS lift_milli
      |  FROM pc JOIN ic ia ON ia.br = pc.a JOIN ic ib ON ib.br = pc.b
      |  CROSS JOIN nn)
      |SELECT a AS brand_a, b AS brand_b,
      |       CAST(c AS BIGINT) AS n_both,
      |       CAST(lift_milli AS BIGINT) AS lift_milli
      |FROM nl WHERE lift_milli < 1000
      |ORDER BY lift_milli, a, b LIMIT 10
      |""".stripMargin)) { (s, dir) =>
    val (_, pc, ic, n) = baskets(s, dir)
    pc.join(broadcast(ic.select(col("br").as("a"), col("c").as("ca"))),
        "a")
      .join(broadcast(ic.select(col("br").as("b"), col("c").as("cb"))),
        "b")
      .crossJoin(broadcast(n))
      .select(col("a").as("brand_a"), col("b").as("brand_b"),
        col("c").as("n_both"),
        expr("CAST((1000 * CAST(n AS DECIMAL(38,0)) * c)" +
          " div (ca * cb) AS BIGINT)").as("lift_milli"))
      .where(col("lift_milli") < 1000)
      .orderBy(col("lift_milli"), col("brand_a"), col("brand_b"))
      .limit(10)
  }

  /** Basket-size yield: how pair mass concentrates in big baskets. */
  def q1010: Q = Q(
    "q1010_basket_size_yield",
    Some(s"""
      |WITH ${sqlBk},
      |sz AS (SELECT o, count(*) AS k FROM bk GROUP BY 1)
      |SELECT CAST(k AS BIGINT) AS basket_size,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(k * (k - 1) // 2 AS BIGINT) AS pairs_per_basket,
      |       CAST(count(*) * (k * (k - 1) // 2) AS BIGINT)
      |         AS pair_mass
      |FROM sz GROUP BY k ORDER BY basket_size
      |""".stripMargin)) { (s, dir) =>
    val (bk, _, _, _) = baskets(s, dir)
    bk.groupBy(col("o")).agg(count(lit(1)).as("k"))
      .groupBy(col("k").as("basket_size"))
      .agg(count(lit(1)).as("n_orders"))
      .select(col("basket_size"), col("n_orders"),
        expr("CAST(basket_size * (basket_size - 1) div 2 AS BIGINT)")
          .as("pairs_per_basket"),
        expr("CAST(n_orders * (basket_size * (basket_size - 1) div 2)" +
          " AS BIGINT)").as("pair_mass"))
      .orderBy(col("basket_size"))
  }
}
