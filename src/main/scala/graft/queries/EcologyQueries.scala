package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-9 ecology-completion wave, extending the shipped richness/
  * diversity battery (Chao1, Shannon, Simpson) with the interspecific-
  * encounter and between-community classics: Hurlbert's PIE + the
  * effective number of species, Morisita-Horn community overlap,
  * the full Bray-Curtis dissimilarity matrix, Whittaker's beta
  * diversity, and exact hypergeometric rarefaction E[S₂]/E[S₃].
  * Species = parts, events = lineitems, communities = the supplier's
  * region.
  *
  * Scale: one fact pass builds (part, region) abundance counts (the
  * species table); every statistic is an exact integer rational over
  * its aggregates. Bray-Curtis rides the identity Σ|x−y| = X+Y−2Σmin,
  * so only the INNER part-pair join is needed (co-partitioned on
  * part, ≤C(5,2) output rows); rarefaction uses the falling-factorial
  * closed form — no sampling anywhere. */
object EcologyQueries {

  val all: Seq[Q] = Seq(q821, q822, q823, q824, q825)

  private def sqlBase: String = """
    |ev AS (
    |  SELECT l.l_partkey AS part, n.n_regionkey AS r
    |  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
    |       JOIN nation n ON n.n_nationkey = s.s_nationkey),
    |sp AS (SELECT part, count(*) AS c FROM ev GROUP BY 1),
    |gl AS (SELECT sum(c) AS nn, count(*) AS ns,
    |              sum(CAST(c AS HUGEINT) * c) AS q FROM sp),
    |tbl AS (SELECT part, r, count(*) AS c FROM ev GROUP BY 1, 2),
    |rt AS (SELECT r, sum(c) AS x FROM tbl GROUP BY 1)""".stripMargin

  private def evBase(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_partkey").as("part"), col("l_suppkey"))
      .join(Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_regionkey").as("r"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("part"), col("r"))

  private def tblBase(ev: DataFrame): DataFrame =
    ev.groupBy(col("part"), col("r")).agg(count(lit(1)).as("c"))

  /** Hurlbert's PIE (probability of interspecific encounter) and the
    * effective number of species 1/Σp² — both exact rationals. */
  def q821: Q = Q(
    "q821_hurlbert_pie",
    Some(s"""
      |WITH ${sqlBase}
      |SELECT CAST(nn AS BIGINT) AS n_events,
      |       CAST(ns AS BIGINT) AS n_species,
      |       CAST((1000000 * nn * (nn * nn - q))
      |            // ((nn - 1) * nn * nn) AS BIGINT) AS pie_micro,
      |       CAST((1000 * nn * nn) // q AS BIGINT) AS ens_milli
      |FROM gl
      |""".stripMargin)) { (s, dir) =>
    evBase(s, dir).groupBy(col("part")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c")).cast("decimal(38,0)").as("nn"),
        count(lit(1)).as("ns"),
        sum(col("c").cast("decimal(38,0)") * col("c")).as("q"))
      .select(col("nn").cast("long").as("n_events"),
        col("ns").cast("long").as("n_species"),
        expr("""CAST((1000000 * nn * (nn * nn - q)
          |  - (1000000 * nn * (nn * nn - q)) % ((nn - 1) * nn * nn))
          |  / ((nn - 1) * nn * nn) AS DECIMAL(38,0))""".stripMargin)
          .cast("long").as("pie_micro"),
        expr("CAST((1000 * nn * nn - (1000 * nn * nn) % q) / q" +
          " AS DECIMAL(38,0))").cast("long").as("ens_milli"))
  }

  /** Morisita-Horn overlap between the region-0 and region-1
    * communities — the integer-cleared form
    * 2·Σxy·X·Y / (Σx²·Y² + Σy²·X²). */
  def q822: Q = Q(
    "q822_morisita_horn",
    Some(s"""
      |WITH ${sqlBase},
      |a AS (SELECT part, CAST(c AS HUGEINT) AS x FROM tbl WHERE r = 0),
      |b AS (SELECT part, CAST(c AS HUGEINT) AS y FROM tbl WHERE r = 1),
      |mm AS (SELECT sum(a.x * b.y) AS sxy
      |       FROM a JOIN b ON b.part = a.part),
      |ma AS (SELECT sum(x) AS xx, sum(x * x) AS qx FROM a),
      |mb AS (SELECT sum(y) AS yy, sum(y * y) AS qy FROM b)
      |SELECT CAST(mm.sxy AS BIGINT) AS cross_sum,
      |       CAST((2000 * mm.sxy * ma.xx * mb.yy)
      |            // (ma.qx * mb.yy * mb.yy + mb.qy * ma.xx * ma.xx)
      |            AS BIGINT) AS morisita_horn_milli
      |FROM mm CROSS JOIN ma CROSS JOIN mb
      |""".stripMargin)) { (s, dir) =>
    val tbl = tblBase(evBase(s, dir)).materialize()
    val a = tbl.where(col("r") === 0)
      .select(col("part"), col("c").cast("decimal(38,0)").as("x"))
    val b = tbl.where(col("r") === 1)
      .select(col("part").as("part2"), col("c").cast("decimal(38,0)").as("y"))
    val mm = a.join(b, col("part") === col("part2"))
      .agg(sum(col("x") * col("y")).as("sxy"))
    val ma = a.agg(sum(col("x")).as("xx"), sum(col("x") * col("x")).as("qx"))
    val mb = b.agg(sum(col("y")).as("yy"), sum(col("y") * col("y")).as("qy"))
    mm.crossJoin(broadcast(ma)).crossJoin(broadcast(mb))
      .select(col("sxy").cast("long").as("cross_sum"),
        expr("""CAST((2000 * sxy * xx * yy
          |  - (2000 * sxy * xx * yy) % (qx * yy * yy + qy * xx * xx))
          |  / (qx * yy * yy + qy * xx * xx) AS DECIMAL(38,0))"""
          .stripMargin).cast("long").as("morisita_horn_milli"))
  }

  /** Bray-Curtis dissimilarity for every region pair via
    * 1 − 2Σmin/(X+Y) — inner join on part only. */
  def q823: Q = Q(
    "q823_bray_curtis_matrix",
    Some(s"""
      |WITH ${sqlBase},
      |pw AS (
      |  SELECT a.r AS ra, b.r AS rb, sum(least(a.c, b.c)) AS smin
      |  FROM tbl a JOIN tbl b ON b.part = a.part AND b.r > a.r
      |  GROUP BY 1, 2)
      |SELECT CAST(pw.ra AS BIGINT) AS ra, CAST(pw.rb AS BIGINT) AS rb,
      |       CAST(pw.smin AS BIGINT) AS shared_min,
      |       CAST(1000 - (2000 * pw.smin) // (xa.x + xb.x) AS BIGINT)
      |         AS bray_curtis_milli
      |FROM pw JOIN rt xa ON xa.r = pw.ra JOIN rt xb ON xb.r = pw.rb
      |ORDER BY ra, rb
      |""".stripMargin)) { (s, dir) =>
    val tbl = tblBase(evBase(s, dir)).materialize()
    val rt = tbl.groupBy(col("r")).agg(sum(col("c")).as("x"))
    val b = tbl.select(col("part").as("part2"), col("r").as("rb"),
      col("c").as("cb"))
    val pw = tbl
      .join(b, col("part") === col("part2") && col("rb") > col("r"))
      .groupBy(col("r").as("ra"), col("rb"))
      .agg(sum(least(col("c"), col("cb"))).as("smin"))
    pw.join(broadcast(rt.select(col("r").as("ra"), col("x").as("xa"))),
        Seq("ra"))
      .join(broadcast(rt.select(col("r").as("rb"), col("x").as("xb"))),
        Seq("rb"))
      .select(col("ra").cast("long").as("ra"),
        col("rb").cast("long").as("rb"),
        col("smin").cast("long").as("shared_min"),
        expr("CAST(1000 - (2000 * smin) div (xa + xb) AS BIGINT)")
          .as("bray_curtis_milli"))
      .orderBy(col("ra"), col("rb"))
  }

  /** Whittaker's beta diversity: γ richness over mean per-region α,
    * minus one — exact integer ratio. */
  def q824: Q = Q(
    "q824_whittaker_beta",
    Some(s"""
      |WITH ${sqlBase},
      |al AS (SELECT count(*) AS nr, sum(a) AS sa FROM
      |       (SELECT r, count(DISTINCT part) AS a FROM ev GROUP BY 1))
      |SELECT CAST(gl.ns AS BIGINT) AS gamma_species,
      |       CAST((1000 * al.sa) // al.nr AS BIGINT) AS mean_alpha_milli,
      |       CAST((1000 * gl.ns * al.nr) // al.sa - 1000 AS BIGINT)
      |         AS beta_milli
      |FROM gl CROSS JOIN al
      |""".stripMargin)) { (s, dir) =>
    val ev = evBase(s, dir).materialize()
    val gl = ev.agg(countDistinct(col("part")).as("ns"))
    val al = ev.groupBy(col("r"))
      .agg(countDistinct(col("part")).as("a"))
      .agg(count(lit(1)).as("nr"), sum(col("a")).as("sa"))
    gl.crossJoin(broadcast(al))
      .select(col("ns").cast("long").as("gamma_species"),
        expr("CAST((1000 * sa) div nr AS BIGINT)").as("mean_alpha_milli"),
        expr("CAST((1000 * ns * nr) div sa - 1000 AS BIGINT)")
          .as("beta_milli"))
  }

  /** Exact rarefaction: expected species count in random 2- and
    * 3-event subsamples via falling-factorial hypergeometrics. */
  def q825: Q = Q(
    "q825_rarefaction_es",
    Some(s"""
      |WITH ${sqlBase},
      |rf AS (SELECT
      |  sum(CAST(nn - c AS HUGEINT) * (nn - c - 1)) AS s2num,
      |  sum(CAST(nn - c AS HUGEINT) * (nn - c - 1) * (nn - c - 2))
      |    AS s3num
      |  FROM sp CROSS JOIN gl)
      |SELECT CAST(gl.ns AS BIGINT) AS n_species,
      |       CAST(1000 * gl.ns
      |            - (1000 * rf.s2num) // (gl.nn * (gl.nn - 1))
      |            AS BIGINT) AS es2_milli,
      |       CAST(1000 * gl.ns
      |            - (1000 * rf.s3num)
      |              // (gl.nn * (gl.nn - 1) * (gl.nn - 2))
      |            AS BIGINT) AS es3_milli
      |FROM gl CROSS JOIN rf
      |""".stripMargin)) { (s, dir) =>
    val sp = evBase(s, dir).groupBy(col("part"))
      .agg(count(lit(1)).as("c")).materialize()
    val gl = sp.agg(sum(col("c")).cast("decimal(38,0)").as("nn"),
      count(lit(1)).as("ns"))
    val rf = sp.crossJoin(broadcast(gl))
      .select(((col("nn") - col("c")) * (col("nn") - col("c") - 1))
        .as("t2"),
        ((col("nn") - col("c")) * (col("nn") - col("c") - 1)
          * (col("nn") - col("c") - 2)).as("t3"))
      .agg(sum(col("t2")).as("s2num"), sum(col("t3")).as("s3num"))
    gl.crossJoin(broadcast(rf))
      .select(col("ns").cast("long").as("n_species"),
        expr("""CAST(1000 * ns - CAST((1000 * s2num
          |  - (1000 * s2num) % (nn * (nn - 1))) / (nn * (nn - 1))
          |  AS DECIMAL(38,0)) AS BIGINT)""".stripMargin).as("es2_milli"),
        expr("""CAST(1000 * ns - CAST((1000 * s3num
          |  - (1000 * s3num) % (nn * (nn - 1) * (nn - 2)))
          |  / (nn * (nn - 1) * (nn - 2)) AS DECIMAL(38,0)) AS BIGINT)"""
          .stripMargin).as("es3_milli"))
  }
}
