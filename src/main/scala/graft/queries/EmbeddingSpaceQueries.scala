package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Materialize.MatOps
import graft.Tables

/** Round-9 embedding-space geometry wave (extending the hubness/
  * TwoNN/drift/quantization family) on the milli-quantized embedding
  * components (the q661 spine): the diagonal-approximation
  * participation ratio (effective dimensionality), the norm
  * concentration-of-measure audit, the diagonal between/within
  * scatter-trace ratio across labels, the label-centroid cosine
  * matrix (scale cancels, so raw per-label SUM vectors give the exact
  * cosine), and the per-dimension variance-dominance top-5.
  *
  * Scale: one posexplode pass to (label, dim) moment sums — 10×64
  * groups; norms are per-row array folds (no shuffle); the centroid
  * matrix is a 45-pair dim. All moments are exact integers; each
  * statistic is one pinned double. */
object EmbeddingSpaceQueries {

  val all: Seq[Q] = Seq(q926, q927, q928, q929, q930)

  private def sqlPts: String = """
    |pts AS (
    |  SELECT vec_id, CAST(label AS BIGINT) AS label,
    |         list_transform(embedding, v ->
    |           CAST(floor(CAST(v AS DOUBLE) * 1000) AS BIGINT)) AS q
    |  FROM embeddings),
    |pos AS (SELECT unnest(range(1, 65)) AS i),
    |pd AS (
    |  SELECT pos.i AS pos, sum(CAST(q[pos.i] AS HUGEINT)) AS sx,
    |         sum(CAST(q[pos.i] AS HUGEINT) * q[pos.i]) AS sxx,
    |         count(*) AS n
    |  FROM pts CROSS JOIN pos GROUP BY 1)""".stripMargin

  private def ptsBase(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).select(col("vec_id"),
      col("label").cast("long").as("label"),
      transform(col("embedding"),
        v => floor(v.cast("double") * 1000).cast("long")).as("q"))

  /** Per-dimension global moments (pos, sx, sxx, n). */
  private def pdBase(p: DataFrame): DataFrame =
    p.select(posexplode(col("q")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
        count(lit(1)).as("n"))

  /** Participation ratio (diagonal approximation): (Σλ)²/Σλ² over
    * per-dimension variance numerators. */
  def q926: Q = Q(
    "q926_participation_ratio",
    Some(s"""
      |WITH ${sqlPts},
      |vd AS (SELECT pos, n * sxx - sx * sx AS v FROM pd),
      |ag AS (SELECT sum(v) AS sv, sum(CAST(v AS DOUBLE)
      |              * CAST(v AS DOUBLE)) AS sv2, count(*) AS d
      |       FROM vd)
      |SELECT CAST(d AS BIGINT) AS n_dims,
      |       CAST(floor(1000.0 * CAST(sv AS DOUBLE)
      |            * CAST(sv AS DOUBLE) / sv2) AS BIGINT)
      |         AS participation_ratio_milli,
      |       CAST(floor(1000.0 * CAST(sv AS DOUBLE)
      |            * CAST(sv AS DOUBLE) / sv2 / d) AS BIGINT)
      |         AS effective_dim_share_milli
      |FROM ag
      |""".stripMargin)) { (s, dir) =>
    pdBase(ptsBase(s, dir))
      .select((col("n") * col("sxx") - col("sx") * col("sx")).as("v"))
      .agg(sum(col("v")).as("sv"),
        sum(expr("CAST(v AS DOUBLE) * CAST(v AS DOUBLE)")).as("sv2"),
        count(lit(1)).as("d"))
      .select(col("d").cast("long").as("n_dims"),
        expr("""CAST(floor(1000.0 * CAST(sv AS DOUBLE)
          |  * CAST(sv AS DOUBLE) / sv2) AS BIGINT)""".stripMargin)
          .as("participation_ratio_milli"),
        expr("""CAST(floor(1000.0 * CAST(sv AS DOUBLE)
          |  * CAST(sv AS DOUBLE) / sv2 / d) AS BIGINT)""".stripMargin)
          .as("effective_dim_share_milli"))
  }

  /** Norm concentration: mean/var of per-vector ‖q‖² and the relative
    * sd — high-dimensional measure concentration makes it small. */
  def q927: Q = Q(
    "q927_norm_concentration",
    Some(s"""
      |WITH ${sqlPts},
      |nr AS (SELECT list_sum(list_transform(q, v -> v * v)) AS n2
      |       FROM pts),
      |mo AS (SELECT count(*) AS n, sum(CAST(n2 AS HUGEINT)) AS s,
      |              sum(CAST(n2 AS HUGEINT) * n2) AS qq FROM nr)
      |SELECT CAST(n AS BIGINT) AS n_vectors,
      |       CAST(s // n AS BIGINT) AS mean_norm2,
      |       CAST(floor(1000.0
      |            * sqrt(CAST(n * qq - s * s AS DOUBLE)
      |                   / (CAST(n AS DOUBLE) * (n - 1)))
      |            / (CAST(s AS DOUBLE) / n)) AS BIGINT)
      |         AS rel_sd_milli
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    ptsBase(s, dir)
      .select(expr("aggregate(q, CAST(0 AS DECIMAL(38,0)),"
        + " (acc, v) -> CAST(acc + CAST(v AS DECIMAL(38,0)) * v"
        + " AS DECIMAL(38,0)))").as("n2"))
      .agg(count(lit(1)).as("n"), sum(col("n2")).as("s"),
        sum(col("n2") * col("n2")).as("qq"))
      .select(col("n").cast("long").as("n_vectors"),
        expr("CAST((s - s % n) / n AS DECIMAL(38,0))").cast("long")
          .as("mean_norm2"),
        expr("""CAST(floor(1000.0
          |  * sqrt(CAST(n * qq - s * s AS DOUBLE)
          |         / (CAST(n AS DOUBLE) * (n - 1)))
          |  / (CAST(s AS DOUBLE) / n)) AS BIGINT)""".stripMargin)
          .as("rel_sd_milli"))
  }

  /** Diagonal between/within scatter-trace ratio across labels (micro
    * centroids, floor-quantized like the q661 spine). */
  def q928: Q = Q(
    "q928_scatter_ratio",
    Some(s"""
      |WITH ${sqlPts},
      |pl AS (
      |  SELECT label, pos.i AS pos, sum(CAST(q[pos.i] AS HUGEINT)) AS sx,
      |         sum(CAST(q[pos.i] AS HUGEINT) * q[pos.i]) AS sxx,
      |         count(*) AS nl
      |  FROM pts CROSS JOIN pos GROUP BY 1, 2),
      |wd AS (SELECT sum((nl * sxx - sx * sx) // nl) AS w FROM pl),
      |bd AS (
      |  SELECT sum(pl.nl * ((1000000 * pl.sx) // pl.nl
      |                      - (1000000 * pd.sx) // pd.n)
      |                   * ((1000000 * pl.sx) // pl.nl
      |                      - (1000000 * pd.sx) // pd.n)) AS b
      |  FROM pl JOIN pd ON pd.pos = pl.pos)
      |SELECT CAST(floor(1000.0 * CAST(bd.b AS DOUBLE)
      |            / (1000000.0 * 1000000.0 * CAST(wd.w AS DOUBLE)))
      |            AS BIGINT) AS between_within_milli
      |FROM wd CROSS JOIN bd
      |""".stripMargin)) { (s, dir) =>
    val pts = ptsBase(s, dir).materialize()
    val pd = pdBase(pts)
    val pl = pts.select(col("label"), posexplode(col("q")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
        count(lit(1)).as("nl"))
      .materialize()
    val wd = pl.select(expr("CAST((nl * sxx - sx * sx"
      + " - (nl * sxx - sx * sx) % nl) / nl AS DECIMAL(38,0))").as("t"))
      .agg(sum(col("t")).as("w"))
    val bd = pl.join(pd.select(col("pos"), col("sx").as("gsx"),
        col("n").as("gn")), Seq("pos"))
      .select((col("nl").cast("decimal(38,0)")
        * (expr("(1000000 * sx) div nl") - expr("(1000000 * gsx) div gn"))
        * (expr("(1000000 * sx) div nl") - expr("(1000000 * gsx) div gn")))
        .as("t"))
      .agg(sum(col("t")).as("b"))
    wd.crossJoin(broadcast(bd))
      .select(expr("""CAST(floor(1000.0 * CAST(b AS DOUBLE)
        |  / (1000000.0 * 1000000.0 * CAST(w AS DOUBLE))) AS BIGINT)"""
        .stripMargin).as("between_within_milli"))
  }

  /** Label-centroid cosine matrix: cosine of raw per-label SUM
    * vectors (the 1/n scaling cancels) — exact integer dot products. */
  def q929: Q = Q(
    "q929_centroid_cosines",
    Some(s"""
      |WITH ${sqlPts},
      |pl AS (
      |  SELECT label, pos.i AS pos, sum(CAST(q[pos.i] AS HUGEINT)) AS sx
      |  FROM pts CROSS JOIN pos GROUP BY 1, 2),
      |dt AS (
      |  SELECT a.label AS la, b.label AS lb,
      |         sum(a.sx * b.sx) AS dot
      |  FROM pl a JOIN pl b ON b.pos = a.pos AND b.label > a.label
      |  GROUP BY 1, 2),
      |nm AS (SELECT label, sum(sx * sx) AS n2 FROM pl GROUP BY 1)
      |SELECT CAST(dt.la AS BIGINT) AS label_a,
      |       CAST(dt.lb AS BIGINT) AS label_b,
      |       CAST(floor(1000.0 * CAST(dt.dot AS DOUBLE)
      |            / sqrt(CAST(na.n2 AS DOUBLE)
      |                   * CAST(nb.n2 AS DOUBLE))) AS BIGINT)
      |         AS cosine_milli
      |FROM dt JOIN nm na ON na.label = dt.la
      |     JOIN nm nb ON nb.label = dt.lb
      |ORDER BY label_a, label_b
      |""".stripMargin)) { (s, dir) =>
    val pl = ptsBase(s, dir)
      .select(col("label"), posexplode(col("q")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("x").cast("decimal(38,0)")).as("sx"))
      .materialize()
    val b = pl.select(col("label").as("lb"), col("pos").as("pos2"),
      col("sx").as("sxb"))
    val dt = pl.join(b, col("pos") === col("pos2")
        && col("lb") > col("label"))
      .groupBy(col("label").as("la"), col("lb"))
      .agg(sum(col("sx") * col("sxb")).as("dot"))
    val nm = pl.groupBy(col("label"))
      .agg(sum(col("sx") * col("sx")).as("n2"))
    dt.join(broadcast(nm.select(col("label").as("la"), col("n2").as("na"))),
        Seq("la"))
      .join(broadcast(nm.select(col("label").as("lb"), col("n2").as("nb"))),
        Seq("lb"))
      .select(col("la").cast("long").as("label_a"),
        col("lb").cast("long").as("label_b"),
        expr("""CAST(floor(1000.0 * CAST(dot AS DOUBLE)
          |  / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))
          |  AS BIGINT)""".stripMargin).as("cosine_milli"))
      .orderBy(col("label_a"), col("label_b"))
  }

  /** Variance dominance: the top-5 dimensions by variance share and
    * the cumulative share they hold. */
  def q930: Q = Q(
    "q930_dimension_dominance",
    Some(s"""
      |WITH ${sqlPts},
      |vd AS (SELECT pos, n * sxx - sx * sx AS v FROM pd),
      |tv AS (SELECT sum(v) AS t FROM vd),
      |rk AS (SELECT pos, v, row_number() OVER (ORDER BY v DESC, pos)
      |         AS r, sum(v) OVER (ORDER BY v DESC, pos) AS cum
      |       FROM vd)
      |SELECT CAST(rk.r AS BIGINT) AS rank,
      |       CAST(rk.pos AS BIGINT) AS dim,
      |       CAST((1000 * rk.v) // tv.t AS BIGINT) AS share_milli,
      |       CAST((1000 * rk.cum) // tv.t AS BIGINT) AS cum_share_milli
      |FROM rk CROSS JOIN tv WHERE rk.r <= 5 ORDER BY rank
      |""".stripMargin)) { (s, dir) =>
    val vd = pdBase(ptsBase(s, dir))
      .select(col("pos"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("v"))
      .materialize()
    val tv = vd.agg(sum(col("v")).as("t"))
    vd.select(col("pos"), col("v"),
        row_number().over(Window.orderBy(col("v").desc, col("pos")))
          .as("r"),
        sum(col("v")).over(Window.orderBy(col("v").desc, col("pos")))
          .as("cum"))
      .where(col("r") <= 5)
      .crossJoin(broadcast(tv))
      .select(col("r").cast("long").as("rank"),
        // Spark posexplode is 0-based; the oracle's range(1,65) is
        // 1-based — align the REPORTED dim index
        (col("pos") + 1).cast("long").as("dim"),
        expr("CAST((1000 * v - (1000 * v) % t) / t AS DECIMAL(38,0))")
          .cast("long").as("share_milli"),
        expr("CAST((1000 * cum - (1000 * cum) % t) / t" +
          " AS DECIMAL(38,0))").cast("long").as("cum_share_milli"))
      .orderBy(col("rank"))
  }
}
