package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps

/** Round-10 bipartite-HITS wave on the customer→supplier purchase
  * graph (an edge per DISTINCT (customer, supplier) trading pair).
  * Deliberate counterpart to q416 (OpsQueries), which runs WEIGHTED
  * HITS (line-count edge weights, per-half-step max-normalization):
  * this wave is the BINARY-edge unnormalized variant — different
  * operator semantics (presence vs intensity), plus the audit faces
  * q416 lacks (hub side, degree correlation, concentration curve,
  * authority Gini):
  * exact-integer HITS power iteration (hubs = customers, authorities
  * = suppliers), the edge-level degree correlation, per-round
  * concentration of authority mass, and the authority Gini.
  *
  * Exactness: the iteration is UNNORMALIZED — h₀ = 1, a_k(s) =
  * Σ_{c~s} h_{k−1}(c), h_k(c) = Σ_{s~c} a_k(s) — so every score is an
  * exact integer (the q657 Katz discipline; scores grow as deg^k and
  * ride DECIMAL(38,0), the BIGINT output cast is the loud ANSI
  * bound). Rankings are what HITS means, and ranking is
  * normalization-free. Correlation/Gini quantize exact integer
  * moments through the floor-double idiom.
  *
  * Scale: ONE fact-fact join (lineitem ⋈ orders on the order key — a
  * co-partitioned hash join) collapses straight into the distinct
  * trading-pair dim ([[TradeGraph]] spine, shared with q416's
  * weighted HITS); every iteration round is one broadcast-joined
  * aggregate over that edge dim, and the whole 5-round chain is a
  * SpineCache spine built once per process for the five queries. */
object BipartiteHitsQueries {

  val all: Seq[Q] = Seq(q981, q982, q983, q984, q985)

  /** Edge dim + 3 authority / 2 hub rounds (MATERIALIZED). */
  private def sqlHits: String = """
    |be AS MATERIALIZED (
    |  SELECT DISTINCT o.o_custkey AS cu, l.l_suppkey AS su
    |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
    |a1 AS MATERIALIZED (
    |  SELECT su, CAST(count(*) AS HUGEINT) AS a FROM be GROUP BY 1),
    |h1 AS MATERIALIZED (
    |  SELECT cu, sum(a) AS h FROM be JOIN a1 USING (su) GROUP BY 1),
    |a2 AS MATERIALIZED (
    |  SELECT su, sum(h) AS a FROM be JOIN h1 USING (cu) GROUP BY 1),
    |h2 AS MATERIALIZED (
    |  SELECT cu, sum(a) AS h FROM be JOIN a2 USING (su) GROUP BY 1),
    |a3 AS MATERIALIZED (
    |  SELECT su, sum(h) AS a FROM be JOIN h2 USING (cu) GROUP BY 1)""".stripMargin

  /** Spark twin: (edge dim be(cu, su), Vector(a1, a2, a3), h2).
    *
    * The edge dim is the [[TradeGraph]] spine's binary projection
    * (distinct by construction), and the five iteration tables ride a
    * second SpineCache spine (kind, rnd, id, sc) — the fact-fact join
    * and the whole power-iteration chain are built ONCE per process
    * and each of the five wave members reads just the dims it needs,
    * instead of rebuilding the chain five times. Values are identical:
    * a parquet round-trip of long/decimal(38,0) is exact. */
  private def hits(s: SparkSession, dir: String)
      : (DataFrame, Vector[DataFrame], DataFrame) = {
    val be = TradeGraph.pairs(s, dir).select(col("cu"), col("su"))
    val sc = graft.sources.SpineCache.table(s, dir, "bhits_scores",
      Seq("lineitem", "orders")) {
      val a1 = be.groupBy(col("su"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("a"))
        .materialize()
      def toH(a: DataFrame): DataFrame =
        be.join(broadcast(a), "su").groupBy(col("cu"))
          .agg(sum(col("a")).as("h")).materialize()
      def toA(h: DataFrame): DataFrame =
        be.join(broadcast(h), "cu").groupBy(col("su"))
          .agg(sum(col("h")).as("a")).materialize()
      val h1 = toH(a1)
      val a2 = toA(h1)
      val h2 = toH(a2)
      val a3 = toA(h2)
      def tag(df: DataFrame, kind: String, rnd: Int, id: String,
          v: String): DataFrame =
        df.select(lit(kind).as("kind"), lit(rnd.toLong).as("rnd"),
          col(id).cast("long").as("id"), col(v).as("sc"))
      tag(a1, "a", 1, "su", "a")
        .unionAll(tag(a2, "a", 2, "su", "a"))
        .unionAll(tag(a3, "a", 3, "su", "a"))
        .unionAll(tag(h1, "h", 1, "cu", "h"))
        .unionAll(tag(h2, "h", 2, "cu", "h"))
    }
    def aK(k: Int): DataFrame =
      sc.where(col("kind") === "a" && col("rnd") === k.toLong)
        .select(col("id").as("su"), col("sc").as("a"))
    val h2 = sc.where(col("kind") === "h" && col("rnd") === 2L)
      .select(col("id").as("cu"), col("sc").as("h"))
    (be, Vector(aK(1), aK(2), aK(3)), h2)
  }

  /** Top-10 authorities (suppliers) after 3 rounds. */
  def q981: Q = Q(
    "q981_hits_authorities",
    Some(s"""
      |WITH ${sqlHits}
      |SELECT CAST(su AS BIGINT) AS supplier,
      |       CAST(a AS BIGINT) AS authority_sc
      |FROM a3 ORDER BY a DESC, su LIMIT 10
      |""".stripMargin)) { (s, dir) =>
    val (_, as, _) = hits(s, dir)
    as(2).orderBy(col("a").desc, col("su")).limit(10)
      .select(col("su").cast("long").as("supplier"),
        col("a").cast("long").as("authority_sc"))
  }

  /** Top-10 hubs (customers) after 2 full rounds. */
  def q982: Q = Q(
    "q982_hits_hubs",
    Some(s"""
      |WITH ${sqlHits}
      |SELECT CAST(cu AS BIGINT) AS customer,
      |       CAST(h AS BIGINT) AS hub_sc
      |FROM h2 ORDER BY h DESC, cu LIMIT 10
      |""".stripMargin)) { (s, dir) =>
    val (_, _, h2) = hits(s, dir)
    h2.orderBy(col("h").desc, col("cu")).limit(10)
      .select(col("cu").cast("long").as("customer"),
        col("h").cast("long").as("hub_sc"))
  }

  /** Edge-level degree correlation (bipartite assortativity): Pearson
    * of (customer degree, supplier degree) over trading pairs, from
    * exact integer moment sums through one double formula. */
  def q983: Q = Q(
    "q983_bipartite_degree_corr",
    Some(s"""
      |WITH ${sqlHits},
      |cd AS (SELECT cu, count(*) AS dc FROM be GROUP BY 1),
      |sd AS (SELECT su, count(*) AS ds FROM be GROUP BY 1),
      |xy AS (SELECT CAST(cd.dc AS HUGEINT) AS x,
      |              CAST(sd.ds AS HUGEINT) AS y
      |       FROM be JOIN cd USING (cu) JOIN sd USING (su)),
      |mo AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |              sum(x * y) AS sxy, sum(x * x) AS sxx,
      |              sum(y * y) AS syy
      |       FROM xy)
      |SELECT CAST(n AS BIGINT) AS n_edges,
      |       CAST(CASE WHEN (n * sxx - sx * sx) = 0
      |                   OR (n * syy - sy * sy) = 0 THEN NULL
      |            ELSE floor(1000.0 * (CAST(n * sxy - sx * sy AS DOUBLE)
      |                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
      |                      * CAST(n * syy - sy * sy AS DOUBLE))))
      |            END AS BIGINT) AS degree_corr_milli
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    val (be, _, _) = hits(s, dir)
    val cd = be.groupBy(col("cu")).agg(count(lit(1)).as("dc"))
    val sd = be.groupBy(col("su")).agg(count(lit(1)).as("ds"))
    be.join(broadcast(cd), "cu").join(broadcast(sd), "su")
      .select(col("dc").cast("decimal(38,0)").as("x"),
        col("ds").cast("decimal(38,0)").as("y"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("n").cast("long").as("n_edges"),
        expr("""CAST(CASE WHEN (n * sxx - sx * sx) = 0
          |            OR (n * syy - sy * sy) = 0 THEN NULL
          |  ELSE floor(1000.0 * (CAST(n * sxy - sx * sy AS DOUBLE)
          |       / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
          |            * CAST(n * syy - sy * sy AS DOUBLE))))
          |  END AS BIGINT)""".stripMargin).as("degree_corr_milli"))
  }

  /** Authority-concentration curve: per round, the top authority and
    * the milli share of total mass its top-10 hold — does iteration
    * concentrate the ranking? */
  def q984: Q = Q(
    "q984_hits_concentration",
    Some(s"""
      |WITH ${sqlHits},
      |${Seq(1, 2, 3).map { k =>
        s"""t$k AS (SELECT $k AS round,
           |  (SELECT su FROM a$k ORDER BY a DESC, su LIMIT 1) AS top_su,
           |  (SELECT sum(a) FROM
           |    (SELECT a FROM a$k ORDER BY a DESC, su LIMIT 10))
           |    AS top10,
           |  (SELECT sum(a) FROM a$k) AS tot)""".stripMargin
      }.mkString(",\n")}
      |SELECT CAST(round AS BIGINT) AS round,
      |       CAST(top_su AS BIGINT) AS top_supplier,
      |       CAST((1000 * top10) // tot AS BIGINT) AS top10_milli
      |FROM (SELECT * FROM t1 UNION ALL SELECT * FROM t2
      |      UNION ALL SELECT * FROM t3)
      |ORDER BY round
      |""".stripMargin)) { (s, dir) =>
    val (_, as, _) = hits(s, dir)
    as.zipWithIndex.map { case (a, ix) =>
      val top1 = a.orderBy(col("a").desc, col("su")).limit(1)
        .select(col("su").as("top_su"))
      val top10 = a.orderBy(col("a").desc, col("su")).limit(10)
        .agg(sum(col("a")).as("top10"))
      val tot = a.agg(sum(col("a")).as("tot"))
      top1.crossJoin(broadcast(top10)).crossJoin(broadcast(tot))
        .select(lit(ix + 1L).as("round"),
          col("top_su").cast("long").as("top_supplier"),
          expr("CAST((1000 * top10) div tot AS BIGINT)")
            .as("top10_milli"))
    }.reduce(_ unionAll _).orderBy(col("round"))
  }

  /** Authority Gini: concentration of the round-3 authority mass over
    * suppliers — global rank rides the bucket-parallel spine with the
    * DIGIT-LENGTH bucket (monotone in the score, engine-portable). */
  def q985: Q = Q(
    "q985_authority_gini",
    Some(s"""
      |WITH ${sqlHits},
      |rk AS (SELECT a, row_number() OVER (ORDER BY a, su) AS i
      |       FROM a3),
      |mo AS (SELECT count(*) AS n, sum(a) AS sa,
      |              sum(CAST(i AS HUGEINT) * a) AS sia
      |       FROM rk)
      |SELECT CAST(n AS BIGINT) AS n_suppliers,
      |       CAST(CASE WHEN sa = 0 THEN NULL
      |            ELSE (1000 * (2 * sia - (n + 1) * sa)) // (n * sa)
      |            END AS BIGINT) AS gini_milli
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    val (_, as, _) = hits(s, dir)
    val rk = graft.dedup.SortedNeighborhood.globalRankCum(
        as(2).withColumn("lb", length(col("a").cast("string"))),
        "su", "lb", Seq("a"))
      .select(col("a"), col("__rank").as("i"))
    rk.agg(count(lit(1)).as("n"), sum(col("a")).as("sa"),
        sum(col("i").cast("decimal(38,0)") * col("a")).as("sia"))
      .select(col("n").cast("long").as("n_suppliers"),
        expr("CAST(CASE WHEN sa = 0 THEN NULL" +
          " ELSE (1000 * (2 * sia - (n + 1) * sa)) div (n * sa)" +
          " END AS BIGINT)").as("gini_milli"))
  }
}
