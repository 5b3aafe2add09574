package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables
import graft.text.TextAnalysis

/** Round-9 corpus-keyness wave on the documents table, split into the
  * even- vs odd-numbered source halves: Dunning's G² log-likelihood
  * keyness top-15, Monroe's Dirichlet-smoothed (α=1) log-odds z top
  * tokens, the Jaccard agreement of the two keyness rankings, a
  * top-30-token source-homogeneity χ², and per-source exclusive-token
  * shares.
  *
  * Scale: one token-explode pass to the (token, group) count table;
  * keyness scores are per-token pinned doubles from exact counts,
  * QUANTIZED to milli BEFORE any ordering (so top-k selection is
  * deterministic across engines, token tie-break); top-k rides
  * orderBy+limit (TakeOrdered, the q677 discipline). */
object KeynessQueries {

  val all: Seq[Q] = Seq(q931, q932, q933, q934, q935)

  /** Oracle group token counts `tc(w, a, b)` + totals `tt(na, nb, v)`. */
  private def sqlTc: String = """
    |tok AS (
    |  SELECT CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
    |              THEN 0 ELSE 1 END AS g,
    |         unnest(regexp_split_to_array(trim(text), '\s+')) AS w
    |  FROM documents),
    |tc AS (SELECT w, sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS a,
    |              sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS b
    |       FROM tok GROUP BY 1),
    |tt AS (SELECT sum(a) AS na, sum(b) AS nb, count(*) AS v FROM tc)"""
    .stripMargin

  private def tcBase(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(when(expr("CAST(substr(source, 4) AS INT) % 2 = 0"), 0)
        .otherwise(1).as("g"),
        explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy(col("w"))
      .agg(sum(when(col("g") === 0, 1).otherwise(0)).as("a"),
        sum(when(col("g") === 1, 1).otherwise(0)).as("b"))

  /** Dunning G² per token (pinned double, milli-quantized): terms with
    * zero counts contribute 0 by the x·ln(x/E) → 0 convention. */
  private def g2Sql: String =
    """CAST(floor(1000.0 * 2.0 * (
      |  CASE WHEN a = 0 THEN 0.0 ELSE a * ln(CAST(a AS DOUBLE)
      |    * (na + nb) / (CAST(na AS DOUBLE) * (a + b))) END
      |  + CASE WHEN b = 0 THEN 0.0 ELSE b * ln(CAST(b AS DOUBLE)
      |    * (na + nb) / (CAST(nb AS DOUBLE) * (a + b))) END))
      |  AS BIGINT)""".stripMargin

  /** Monroe log-odds z per token (α = 1), milli-quantized. */
  private def zSql: String =
    """CAST(floor(1000.0 * (
      |  ln((a + 1.0) / (na + v - a - 1.0))
      |  - ln((b + 1.0) / (nb + v - b - 1.0)))
      |  / sqrt(1.0 / (a + 1.0) + 1.0 / (b + 1.0))) AS BIGINT)"""
      .stripMargin

  /** Top-15 Dunning G² keyness tokens with direction. */
  def q931: Q = Q(
    "q931_dunning_keyness",
    Some(s"""
      |WITH ${sqlTc},
      |sc AS (SELECT w, a, b, ${g2Sql} AS g2
      |       FROM tc CROSS JOIN tt)
      |SELECT w AS token, CAST(a AS BIGINT) AS count_even,
      |       CAST(b AS BIGINT) AS count_odd,
      |       CAST(g2 AS BIGINT) AS g2_milli,
      |       CASE WHEN a * (SELECT nb FROM tt)
      |                 > b * (SELECT na FROM tt)
      |            THEN 'even' ELSE 'odd' END AS leans
      |FROM sc ORDER BY g2 DESC, token LIMIT 15
      |""".stripMargin)) { (s, dir) =>
    val tc = tcBase(s, dir)
    val tt = tc.agg(sum(col("a")).as("na"), sum(col("b")).as("nb"),
      count(lit(1)).as("v"))
    tc.crossJoin(broadcast(tt))
      .select(col("w").as("token"), col("a"), col("b"),
        expr(g2Sql).as("g2"),
        when(col("a") * col("nb") > col("b") * col("na"), "even")
          .otherwise("odd").as("leans"))
      .orderBy(col("g2").desc, col("token")).limit(15)
      .select(col("token"), col("a").cast("long").as("count_even"),
        col("b").cast("long").as("count_odd"),
        col("g2").cast("long").as("g2_milli"), col("leans"))
  }

  /** Top-10 |Monroe z| fightin' words. */
  def q932: Q = Q(
    "q932_monroe_log_odds",
    Some(s"""
      |WITH ${sqlTc},
      |sc AS (SELECT w, a, b, ${zSql} AS z FROM tc CROSS JOIN tt)
      |SELECT w AS token, CAST(a AS BIGINT) AS count_even,
      |       CAST(b AS BIGINT) AS count_odd,
      |       CAST(z AS BIGINT) AS z_milli
      |FROM sc ORDER BY abs(z) DESC, token LIMIT 10
      |""".stripMargin)) { (s, dir) =>
    val tc = tcBase(s, dir)
    val tt = tc.agg(sum(col("a")).as("na"), sum(col("b")).as("nb"),
      count(lit(1)).as("v"))
    tc.crossJoin(broadcast(tt))
      .select(col("w").as("token"), col("a"), col("b"),
        expr(zSql).as("z"))
      .orderBy(abs(col("z")).desc, col("token")).limit(10)
      .select(col("token"), col("a").cast("long").as("count_even"),
        col("b").cast("long").as("count_odd"),
        col("z").cast("long").as("z_milli"))
  }

  /** Jaccard agreement of the top-50 G² and top-50 |z| token sets. */
  def q933: Q = Q(
    "q933_keyness_agreement",
    Some(s"""
      |WITH ${sqlTc},
      |sc AS (SELECT w, ${g2Sql} AS g2, ${zSql} AS z
      |       FROM tc CROSS JOIN tt),
      |t1 AS (SELECT w FROM sc ORDER BY g2 DESC, w LIMIT 50),
      |t2 AS (SELECT w FROM sc ORDER BY abs(z) DESC, w LIMIT 50),
      |ix AS (SELECT count(*) AS shared_n FROM t1 JOIN t2 ON t2.w = t1.w)
      |SELECT CAST(shared_n AS BIGINT) AS n_shared,
      |       CAST((1000 * shared_n) // (100 - shared_n) AS BIGINT)
      |         AS jaccard_milli
      |FROM ix
      |""".stripMargin)) { (s, dir) =>
    val tc = tcBase(s, dir)
    val tt = tc.agg(sum(col("a")).as("na"), sum(col("b")).as("nb"),
      count(lit(1)).as("v"))
    val sc = tc.crossJoin(broadcast(tt))
      .select(col("w"), expr(g2Sql).as("g2"), expr(zSql).as("z"))
      .materialize()
    val t1 = sc.orderBy(col("g2").desc, col("w")).limit(50)
      .select(col("w"))
    val t2 = sc.orderBy(abs(col("z")).desc, col("w")).limit(50)
      .select(col("w").as("w2"))
    t1.join(t2, col("w") === col("w2"))
      .agg(count(lit(1)).as("both"))
      .select(col("both").cast("long").as("n_shared"),
        expr("CAST((1000 * both) div (100 - both) AS BIGINT)")
          .as("jaccard_milli"))
  }

  /** Source-homogeneity χ² over the top-30 global tokens: per-cell
    * integer milli terms against the source-size expectation. */
  def q934: Q = Q(
    "q934_source_homogeneity",
    Some("""
      |WITH tok AS (
      |  SELECT source,
      |         unnest(regexp_split_to_array(trim(text), '\s+')) AS w
      |  FROM documents),
      |gt AS (SELECT w, count(*) AS cw FROM tok GROUP BY 1),
      |top AS (SELECT w FROM gt ORDER BY cw DESC, w LIMIT 30),
      |st AS (SELECT source, count(*) AS ns FROM tok GROUP BY 1),
      |gl AS (SELECT sum(ns) AS nn FROM st),
      |ct AS (SELECT tok.source, tok.w, count(*) AS c
      |       FROM tok JOIN top ON top.w = tok.w GROUP BY 1, 2),
      |tm AS (
      |  SELECT (1000 * (gl.nn * ct.c - gt.cw * st.ns)
      |          * (gl.nn * ct.c - gt.cw * st.ns))
      |           // (gl.nn * gt.cw * st.ns) AS term
      |  FROM ct JOIN gt ON gt.w = ct.w JOIN st ON st.source = ct.source
      |  CROSS JOIN gl)
      |SELECT CAST(count(*) AS BIGINT) AS n_cells,
      |       CAST(sum(term) // 1000 AS BIGINT) AS chi2_int
      |FROM tm
      |""".stripMargin)) { (s, dir) =>
    val tok = Tables.documents(s, dir)
      .select(col("source"),
        explode(TextAnalysis.tokens(col("text"))).as("w"))
      .materialize()
    val gt = tok.groupBy(col("w")).agg(count(lit(1)).as("cw"))
      .materialize()
    val top = gt.orderBy(col("cw").desc, col("w")).limit(30)
      .select(col("w").as("wt"))
    val st = tok.groupBy(col("source")).agg(count(lit(1)).as("ns"))
    val gl = st.agg(sum(col("ns")).as("nn"))
    val ct = tok.join(broadcast(top), col("w") === col("wt"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
    ct.join(broadcast(gt), Seq("w")).join(broadcast(st), Seq("source"))
      .crossJoin(broadcast(gl))
      .select(expr("""(1000 * (nn * c - cw * ns) * (nn * c - cw * ns))
        |  div (nn * cw * ns)""".stripMargin).as("term"))
      .agg(count(lit(1)).as("nc"), sum(col("term")).as("sc"))
      .select(col("nc").cast("long").as("n_cells"),
        expr("CAST(sc div 1000 AS BIGINT)").as("chi2_int"))
  }

  /** Per-source exclusive-token share: tokens appearing in exactly
    * one source, as a share of the source's distinct vocabulary. */
  def q935: Q = Q(
    "q935_source_exclusivity",
    Some("""
      |WITH tok AS (
      |  SELECT source,
      |         unnest(regexp_split_to_array(trim(text), '\s+')) AS w
      |  FROM documents),
      |sv AS (SELECT DISTINCT source, w FROM tok),
      |wx AS (SELECT w, count(*) AS nsrc FROM sv GROUP BY 1),
      |ex AS (
      |  SELECT sv.source, count(*) AS vocab,
      |         sum(CASE WHEN wx.nsrc = 1 THEN 1 ELSE 0 END) AS excl
      |  FROM sv JOIN wx ON wx.w = sv.w GROUP BY 1)
      |SELECT source, CAST(vocab AS BIGINT) AS n_vocab,
      |       CAST(excl AS BIGINT) AS n_exclusive,
      |       CAST((1000 * excl) // vocab AS BIGINT)
      |         AS exclusive_share_milli
      |FROM ex ORDER BY source
      |""".stripMargin)) { (s, dir) =>
    val sv = Tables.documents(s, dir)
      .select(col("source"),
        explode(TextAnalysis.tokens(col("text"))).as("w"))
      .distinct().materialize()
    val wx = sv.groupBy(col("w")).agg(count(lit(1)).as("nsrc"))
    sv.join(wx, Seq("w"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("vocab"),
        sum(when(col("nsrc") === 1, 1).otherwise(0)).as("excl"))
      .select(col("source"), col("vocab").cast("long").as("n_vocab"),
        col("excl").cast("long").as("n_exclusive"),
        expr("CAST((1000 * excl) div vocab AS BIGINT)")
          .as("exclusive_share_milli"))
      .orderBy(col("source"))
  }
}
