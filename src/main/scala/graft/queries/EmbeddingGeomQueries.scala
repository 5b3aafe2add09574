package graft.queries

import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-9 embedding-geometry wave: corpus anisotropy (mean pairwise
  * cosine WITHOUT a pair join — the sum-of-normals identity),
  * per-dimension variance concentration, norm bias by label, dominant
  * centroid dimensions, and the int8 quantization SNR per dimension.
  * Every statistic is one corpus pass reduced to the 64-dim (or
  * 10-label) frame: normalized coordinates are micro-quantized per
  * element BEFORE any sum, so all moments are exact integers and the
  * n² pairwise structure collapses through ‖Σv̂‖² algebra instead of
  * ever being materialized. */
object EmbeddingGeomQueries {

  val all: Seq[Q] = Seq(q701, q702, q703, q704, q705)

  /** Oracle CTE: micro-quantized NORMALIZED coordinates
    * `nq`(vec_id, label, q) — q_i = floor(v_i/‖v‖·10⁶). */
  private def sqlNormQ: String =
    """nv AS (
      |  SELECT vec_id, CAST(label AS BIGINT) AS label, embedding,
      |         sqrt(list_sum(list_transform(embedding, v ->
      |           CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nrm
      |  FROM embeddings),
      |nq AS (
      |  SELECT vec_id, label,
      |         list_transform(embedding, v ->
      |           CAST(floor(CAST(v AS DOUBLE) / nrm * 1000000)
      |                AS BIGINT)) AS q
      |  FROM nv WHERE nrm > 0)""".stripMargin

  private def normQ(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        col("embedding"),
        sqrt(aggregate(transform(col("embedding"),
            v => v.cast("double") * v.cast("double")),
          lit(0.0), (acc, x) => acc + x)).as("nrm"))
      .where(col("nrm") > 0)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"),
          v => floor(v.cast("double") / col("nrm") * 1000000)
            .cast("long")).as("q"))

  /** Corpus anisotropy (Ethayarajh): the mean pairwise cosine of
    * normalized embeddings, computed WITHOUT any pair join via
    * Σᵢ≠ⱼ⟨v̂ᵢ,v̂ⱼ⟩ = ‖Σv̂‖² − Σ‖v̂‖² — per-dim sums squared minus the
    * per-vector self-dots, all exact integers on micro-normals. High
    * anisotropy = a narrow cone = cosine similarities inflated
    * everywhere, the first thing to check before trusting ANN
    * thresholds. */
  def q701: Q = Q(
    "q701_anisotropy",
    Some(s"""
      |WITH ${sqlNormQ},
      |pos AS (SELECT unnest(range(1, 65)) AS i),
      |ds AS (
      |  SELECT pos.i, sum(q[pos.i]) AS sx
      |  FROM nq CROSS JOIN pos GROUP BY 1),
      |ss AS (SELECT sum(CAST(sx AS HUGEINT) * sx) AS s2 FROM ds),
      |tt AS (
      |  SELECT count(*) AS n,
      |         sum(list_sum(list_transform(q, x -> x * x))) AS t2
      |  FROM nq)
      |SELECT CAST(n AS BIGINT) AS n_vectors,
      |       CAST((s2 - t2) // (CAST(n AS HUGEINT) * (n - 1))
      |            // 1000000 AS BIGINT) AS mean_pair_cos_micro,
      |       CAST(t2 // n // 1000000 AS BIGINT) AS mean_self_dot_micro
      |FROM ss CROSS JOIN tt
      |""".stripMargin)) { (s, dir) =>
    val nq = normQ(s, dir).materialize()
    val ds = nq.select(posexplode(col("q")).as(Seq("i", "x")))
      .groupBy(col("i")).agg(sum(col("x")).as("sx"))
    val ss = ds.agg(sum(col("sx").cast("decimal(38,0)") * col("sx"))
      .as("s2"))
    val tt = nq.agg(count(lit(1)).as("n"),
      sum(graft.functions.SketchExprs.dotLong(col("q"), col("q"))
        .cast("decimal(38,0)")).as("t2"))
    ss.crossJoin(broadcast(tt))
      .select(col("n").as("n_vectors"),
        expr("CAST((s2 - t2) div (CAST(n AS DECIMAL(38,0)) * (n - 1))" +
          " div 1000000 AS BIGINT)").as("mean_pair_cos_micro"),
        expr("CAST(t2 div n div 1000000 AS BIGINT)")
          .as("mean_self_dot_micro"))
  }

  /** Per-dimension variance concentration: the share of total variance
    * held by the top-3 dims (rogue-dimension audit — a couple of
    * dominant dims wreck cosine geometry) and the participation ratio
    * (Σλ)²/Σλ² — an effective-dimension count from exact per-dim
    * integer moments (milli-quantized raw coords, one posexplode
    * pass). */
  def q702: Q = Q(
    "q702_variance_concentration",
    Some("""
      |WITH pts AS (
      |  SELECT list_transform(embedding, v ->
      |           CAST(floor(CAST(v AS DOUBLE) * 1000) AS BIGINT)) AS q
      |  FROM embeddings),
      |pos AS (SELECT unnest(range(1, 65)) AS i),
      |pd AS (
      |  SELECT pos.i, count(*) AS n, sum(q[pos.i]) AS sx,
      |         sum(CAST(q[pos.i] AS HUGEINT) * q[pos.i]) AS sxx
      |  FROM pts CROSS JOIN pos GROUP BY 1),
      |vd AS (
      |  SELECT i, CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
      |           AS v
      |  FROM pd),
      |top3 AS (SELECT sum(v) AS t3 FROM (
      |  SELECT v FROM vd ORDER BY v DESC, i LIMIT 3) x),
      |tot AS (SELECT sum(v) AS tv, sum(v * v) AS tv2 FROM vd)
      |SELECT CAST(64 AS BIGINT) AS n_dims,
      |       CAST((1000000 * top3.t3) // tot.tv AS BIGINT)
      |         AS top3_share_ppm,
      |       CAST(floor(CAST(tot.tv AS DOUBLE) * CAST(tot.tv AS DOUBLE)
      |            / CAST(tot.tv2 AS DOUBLE) * 1000.0) AS BIGINT)
      |         AS participation_ratio_milli
      |FROM top3 CROSS JOIN tot
      |""".stripMargin)) { (s, dir) =>
    val vd = Tables.embeddings(s, dir)
      .select(transform(col("embedding"),
        v => floor(v.cast("double") * 1000).cast("long")).as("q"))
      .select(posexplode(col("q")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"))
      .select(col("i"),
        (col("n").cast("decimal(38,0)") * col("sxx")
          - col("sx").cast("decimal(38,0)") * col("sx")).as("v"))
      .materialize() // 64-dim frame
    val top3 = vd.orderBy(col("v").desc, col("i")).limit(3)
      .agg(sum(col("v")).as("t3"))
    val tot = vd.agg(sum(col("v")).as("tv"),
      sum(col("v") * col("v")).as("tv2"))
    top3.crossJoin(broadcast(tot))
      .select(lit(64L).as("n_dims"),
        expr("CAST((1000000 * t3) div tv AS BIGINT)").as("top3_share_ppm"),
        expr("CAST(floor(CAST(tv AS DOUBLE) * CAST(tv AS DOUBLE)" +
          " / CAST(tv2 AS DOUBLE) * 1000.0) AS BIGINT)")
          .as("participation_ratio_milli"))
  }

  /** Norm bias by label: per-label mean embedding norm (micro) and
    * coefficient of variation — systematically longer vectors for some
    * labels bias dot-product retrieval toward them (the audit run
    * before choosing cosine vs dot). Per-vector norms are exact
    * integer self-dots on milli coords; label stats exact moments. */
  def q703: Q = Q(
    "q703_norm_bias_by_label",
    Some("""
      |WITH pts AS (
      |  SELECT CAST(label AS BIGINT) AS label,
      |         CAST(floor(sqrt(CAST(list_sum(list_transform(embedding,
      |           v -> CAST(floor(CAST(v AS DOUBLE) * 1000) AS BIGINT)
      |                * CAST(floor(CAST(v AS DOUBLE) * 1000) AS BIGINT)))
      |           AS DOUBLE))) AS BIGINT) AS nrm
      |  FROM embeddings),
      |st AS (
      |  SELECT label, count(*) AS n, sum(nrm) AS sx,
      |         sum(CAST(nrm AS HUGEINT) * nrm) AS sxx
      |  FROM pts GROUP BY 1)
      |SELECT CAST(label AS BIGINT) AS label,
      |       CAST(n AS BIGINT) AS n_vectors,
      |       CAST(sx // n AS BIGINT) AS mean_norm_milli,
      |       CAST(floor(sqrt(CAST(CAST(n AS HUGEINT) * sxx
      |              - CAST(sx AS HUGEINT) * sx AS DOUBLE))
      |            / CAST(sx AS DOUBLE) * 1000000.0) AS BIGINT)
      |         AS cv_scaled_micro
      |FROM st ORDER BY label
      |""".stripMargin)) { (s, dir) =>
    val pts = Tables.embeddings(s, dir)
      .select(col("label").cast("long").as("label"),
        floor(sqrt(graft.functions.SketchExprs.dotLong(
          transform(col("embedding"),
            v => floor(v.cast("double") * 1000).cast("long")),
          transform(col("embedding"),
            v => floor(v.cast("double") * 1000).cast("long")))
          .cast("double"))).cast("long").as("nrm"))
    pts.groupBy(col("label"))
      .agg(count(lit(1)).as("n"), sum(col("nrm")).as("sx"),
        sum(col("nrm").cast("decimal(38,0)") * col("nrm")).as("sxx"))
      .select(col("label"), col("n").as("n_vectors"),
        expr("CAST(sx div n AS BIGINT)").as("mean_norm_milli"),
        expr("""CAST(floor(sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sxx
               - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE))
             / CAST(sx AS DOUBLE) * 1000000.0) AS BIGINT)""")
          .as("cv_scaled_micro"))
      .orderBy(col("label"))
  }

  /** Dominant centroid dimension per label: the coordinate with the
    * largest |centroid| value and its share of the centroid's L1 mass
    * — a label whose centroid is one hot dimension is a leakage/
    * artifact flag (real semantic clusters spread). Truncating-div
    * micro centroids (the wave-B contract) over one posexplode
    * pass. */
  def q704: Q = Q(
    "q704_dominant_centroid_dim",
    Some("""
      |WITH pts AS (
      |  SELECT CAST(label AS BIGINT) AS label,
      |         list_transform(embedding, v ->
      |           CAST(floor(CAST(v AS DOUBLE) * 1000) AS BIGINT)) AS q
      |  FROM embeddings),
      |pos AS (SELECT unnest(range(1, 65)) AS i),
      |cd AS (
      |  SELECT label, pos.i, (1000 * sum(q[pos.i])) // count(*) AS c
      |  FROM pts CROSS JOIN pos GROUP BY 1, 2),
      |pick AS (
      |  SELECT label, i, abs(c) AS ac, c,
      |         row_number() OVER (PARTITION BY label
      |           ORDER BY abs(c) DESC, i) AS rn,
      |         sum(abs(c)) OVER (PARTITION BY label) AS l1
      |  FROM cd)
      |SELECT CAST(label AS BIGINT) AS label,
      |       CAST(i AS BIGINT) AS top_dim,
      |       CAST(c AS BIGINT) AS centroid_micro,
      |       CAST((1000000 * ac) // l1 AS BIGINT) AS l1_share_ppm
      |FROM pick WHERE rn = 1 ORDER BY label
      |""".stripMargin)) { (s, dir) =>
    val cd = Tables.embeddings(s, dir)
      .select(col("label").cast("long").as("label"),
        transform(col("embedding"),
          v => floor(v.cast("double") * 1000).cast("long")).as("q"))
      .select(col("label"), posexplode(col("q")).as(Seq("i0", "x")))
      .select(col("label"), (col("i0") + 1).cast("long").as("i"),
        col("x"))
      .groupBy(col("label"), col("i"))
      .agg(expr("(1000 * sum(x)) div count(1)").as("c"))
      .materialize() // 10×64 dim
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label")).orderBy(abs(col("c")).desc, col("i"))
    val wl = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label"))
    cd.withColumn("rn", row_number().over(w))
      .withColumn("l1", sum(abs(col("c"))).over(wl))
      .where(col("rn") === 1)
      .select(col("label"), col("i").as("top_dim"),
        col("c").as("centroid_micro"),
        expr("(1000000 * abs(c)) div l1").as("l1_share_ppm"))
      .orderBy(col("label"))
  }

  /** int8 quantization SNR per dimension (symmetric per-tensor scale
    * s = max|v|/127): signal and noise variance from micro-quantized
    * per-element error terms, the 5 WORST dims by SNR — where a
    * per-tensor scale throws away the most geometry (the case for
    * per-dim scales, made with numbers). Scale is a corpus max (exact
    * float), codes are floor(v/s + 0.5) clamped — one shared text. */
  def q705: Q = {
    val code = "CAST(greatest(-127, least(127," +
      " floor(CAST(v AS DOUBLE) / sc + 0.5))) AS BIGINT)"
    val errq = s"CAST(floor((CAST(v AS DOUBLE) - $code * sc) * 1000000)" +
      " AS BIGINT)"
    val sigq = "CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT)"
    Q("q705_int8_snr_per_dim",
      Some(s"""
        |WITH mx AS (
        |  SELECT max(list_max(list_transform(embedding, v ->
        |           abs(CAST(v AS DOUBLE))))) / 127.0 AS sc
        |  FROM embeddings),
        |el AS (
        |  SELECT pos.i, CAST(embedding[pos.i] AS DOUBLE) AS v, mx.sc
        |  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i)
        |       pos CROSS JOIN mx),
        |tm AS (
        |  SELECT i, count(*) AS n,
        |         sum($sigq) AS ss, sum(CAST($sigq AS HUGEINT) * $sigq)
        |           AS ss2,
        |         sum($errq) AS se, sum(CAST($errq AS HUGEINT) * $errq)
        |           AS se2
        |  FROM el GROUP BY 1),
        |snr AS (
        |  SELECT i,
        |         CAST(n AS HUGEINT) * ss2 - CAST(ss AS HUGEINT) * ss
        |           AS vs,
        |         CAST(n AS HUGEINT) * se2 - CAST(se AS HUGEINT) * se
        |           AS ve
        |  FROM tm)
        |SELECT CAST(i AS BIGINT) AS dim,
        |       CAST(vs // 1000000 AS BIGINT) AS signal_var_q,
        |       CAST(ve // 1000000 AS BIGINT) AS noise_var_q,
        |       CAST(CASE WHEN ve = 0 THEN NULL
        |            ELSE floor(CAST(vs AS DOUBLE) / CAST(ve AS DOUBLE)
        |                 * 1000.0) END AS BIGINT) AS snr_milli
        |FROM snr ORDER BY snr_milli, dim LIMIT 5
        |""".stripMargin)) { (s, dir) =>
      val mx = Tables.embeddings(s, dir)
        .agg((max(aggregate(transform(col("embedding"),
            v => abs(v.cast("double"))), lit(0.0),
          (acc, x) => greatest(acc, x))) / 127.0).as("sc"))
      val el = Tables.embeddings(s, dir)
        .select(posexplode(col("embedding")).as(Seq("i0", "vf")))
        .select((col("i0") + 1).cast("long").as("i"),
          col("vf").cast("double").as("v"))
        .crossJoin(broadcast(mx))
      val tm = el.groupBy(col("i"))
        .agg(count(lit(1)).as("n"),
          sum(expr(sigq)).as("ss"),
          sum(expr(s"CAST($sigq AS DECIMAL(38,0)) * $sigq")).as("ss2"),
          sum(expr(errq)).as("se"),
          sum(expr(s"CAST($errq AS DECIMAL(38,0)) * $errq")).as("se2"))
      tm.select(col("i"),
          expr("CAST(n AS DECIMAL(38,0)) * ss2" +
            " - CAST(ss AS DECIMAL(38,0)) * ss").as("vs"),
          expr("CAST(n AS DECIMAL(38,0)) * se2" +
            " - CAST(se AS DECIMAL(38,0)) * se").as("ve"))
        .select(col("i").as("dim"),
          expr("CAST(vs div 1000000 AS BIGINT)").as("signal_var_q"),
          expr("CAST(ve div 1000000 AS BIGINT)").as("noise_var_q"),
          expr("CAST(CASE WHEN ve = 0 THEN NULL" +
            " ELSE floor(CAST(vs AS DOUBLE) / CAST(ve AS DOUBLE)" +
            " * 1000.0) END AS BIGINT)").as("snr_milli"))
        .orderBy(col("snr_milli"), col("dim"))
        .limit(5)
    }
  }
}
