package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-9 cluster-quality wave: Davies–Bouldin, Calinski–Harabasz and
  * Xie–Beni indices of the embedding label clustering, variation of
  * information between two document partitions, and octant-cluster
  * purity. Float discipline: embeddings are milli-quantized on the
  * scan, centroids are exact truncate-toward-zero micro integers (Spark
  * `div` ≡ DuckDB integer `//` — BOTH truncate; DuckDB's `//` never
  * floors, despite its name), every point-to-
  * centroid distance is the exact integer d² (one native kernel call),
  * and the only doubles are final pinned sqrt/ln/divisions quantized
  * per term. Scale shape: one posexplode pass builds the (label, dim)
  * sums — k·64 groups however large the corpus — and everything
  * downstream is label-dim-sized. */
object ClusterQualityQueries {

  val all: Seq[Q] = Seq(q661, q662, q663, q664, q665)

  import graft.functions.SketchExprs.sqEuclideanLong

  /** Shared oracle CTEs: milli-quantized points `pts`(vec_id, label,
    * q), per-(label, dim) sums `pd`, micro-integer centroids
    * `cent`(label, cv, nj), and exact per-point d² to the own
    * centroid `dd`. */
  private def sqlCentroidCtes: String =
    """pts AS (
      |  SELECT vec_id, CAST(label AS BIGINT) AS label,
      |         list_transform(embedding, v ->
      |           CAST(floor(CAST(v AS DOUBLE) * 1000) AS BIGINT)) AS q
      |  FROM embeddings),
      |pos AS (SELECT unnest(range(1, 65)) AS i),
      |pd AS (
      |  SELECT label, pos.i AS pos, sum(q[pos.i]) AS sx, count(*) AS n
      |  FROM pts CROSS JOIN pos GROUP BY 1, 2),
      |cent AS (
      |  SELECT label, list((1000 * sx) // n ORDER BY pos) AS cv,
      |         any_value(n) AS nj
      |  FROM pd GROUP BY 1),
      |dd AS (
      |  SELECT p.vec_id, p.label,
      |         list_sum(list_transform(range(1, 65), k ->
      |           (1000 * p.q[k] - cent.cv[k])
      |             * (1000 * p.q[k] - cent.cv[k]))) AS d2
      |  FROM pts p JOIN cent ON cent.label = p.label)""".stripMargin

  /** Spark twin: milli-quantized points (vec_id, label, q). */
  private def pts(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).select(col("vec_id"),
      col("label").cast("long").as("label"),
      transform(col("embedding"),
        v => floor(v.cast("double") * 1000).cast("long")).as("q"))

  /** Micro-integer centroids (label, cv, nj): one posexplode pass,
    * k·64 groups, truncating div (≡ DuckDB integer `//` — per-dim
    * sums go negative and the engines must truncate IDENTICALLY). */
  private def centroids(p: DataFrame): DataFrame =
    p.select(col("label"), posexplode(col("q")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
      .select(col("label"), col("pos"),
        expr("(1000 * sx) div n").as("c"), col("n"))
      .groupBy(col("label"))
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("c")))),
        s => s.getField("c")).as("cv"),
        max(col("n")).as("nj"))

  /** Exact d² of each point to its own centroid (vec_id, label, d2). */
  private def ownDist2(p: DataFrame, cent: DataFrame): DataFrame =
    p.join(broadcast(cent.select(col("label").as("cl"), col("cv"))),
        col("label") === col("cl"))
      .select(col("vec_id"), col("label"),
        sqEuclideanLong(transform(col("q"), x => x * 1000), col("cv"))
          .as("d2"))

  /** Davies–Bouldin per-label rows: scatter s_j (mean point-to-
    * centroid distance, micro) and the worst similarity ratio
    * max_{i≠j} 1000·(s_i+s_j) // M_ij over centroid distances M —
    * the label with the highest ratio is the least separated. All
    * ratios exact integers over per-point floor(sqrt(d²)) micro
    * distances; the k×k centroid-pair frame is label-dim-sized. */
  def q661: Q = Q(
    "q661_davies_bouldin",
    Some(s"""
      |WITH ${sqlCentroidCtes},
      |sj AS (
      |  SELECT label,
      |         sum(CAST(floor(sqrt(CAST(d2 AS DOUBLE))) AS BIGINT))
      |           // count(*) AS s,
      |         count(*) AS np
      |  FROM dd GROUP BY 1),
      |cm AS (
      |  SELECT a.label AS i, b.label AS j,
      |         CAST(floor(sqrt(CAST(list_sum(list_transform(range(1, 65),
      |           k -> (a.cv[k] - b.cv[k]) * (a.cv[k] - b.cv[k])))
      |           AS DOUBLE))) AS BIGINT) AS m
      |  FROM cent a JOIN cent b ON a.label != b.label),
      |rr AS (
      |  SELECT cm.i AS label,
      |         max(CASE WHEN cm.m = 0 THEN NULL
      |             ELSE (1000 * (si.s + sx.s)) // cm.m END) AS r
      |  FROM cm JOIN sj si ON si.label = cm.i
      |       JOIN sj sx ON sx.label = cm.j
      |  GROUP BY 1)
      |SELECT CAST(sj.label AS BIGINT) AS label,
      |       CAST(sj.np AS BIGINT) AS n_points,
      |       CAST(sj.s AS BIGINT) AS scatter_micro,
      |       CAST(rr.r AS BIGINT) AS worst_ratio_milli
      |FROM sj JOIN rr ON rr.label = sj.label
      |ORDER BY label
      |""".stripMargin)) { (s, dir) =>
    val p = pts(s, dir)
    val cent = centroids(p).materialize() // 10-label dim
    val sj = ownDist2(p, cent)
      .groupBy(col("label"))
      .agg(expr("sum(CAST(floor(sqrt(CAST(d2 AS DOUBLE))) AS BIGINT))" +
        " div count(1)").as("s"),
        count(lit(1)).as("np"))
      .materialize()
    val cm = cent.select(col("label").as("i"), col("cv").as("cva"))
      .join(cent.select(col("label").as("j"), col("cv").as("cvb")),
        col("i") =!= col("j"))
      .select(col("i"), col("j"),
        floor(sqrt(sqEuclideanLong(col("cva"), col("cvb"))
          .cast("double"))).cast("long").as("m"))
    val rr = cm
      .join(broadcast(sj.select(col("label").as("i"), col("s").as("si"))),
        Seq("i"))
      .join(broadcast(sj.select(col("label").as("j"), col("s").as("sx"))),
        Seq("j"))
      .groupBy(col("i").as("label"))
      .agg(max(when(col("m") === 0, lit(null))
        .otherwise(expr("(1000 * (si + sx)) div m"))).as("r"))
    sj.join(rr, Seq("label"))
      .select(col("label"), col("np").as("n_points"),
        col("s").as("scatter_micro"), col("r").as("worst_ratio_milli"))
      .orderBy(col("label"))
  }

  /** Calinski–Harabasz index: CH = [B/(k−1)] / [W/(n−k)] with
    * B = Σ n_j·d²(c_j, g) and W = Σ d²(x, c_label) both EXACT integer
    * micro² sums (DECIMAL(38,0) — W approaches 2⁶² at the test scale),
    * one pinned double division at the end. The global centroid g
    * reuses the per-dim label sums (no second corpus pass). */
  def q662: Q = Q(
    "q662_calinski_harabasz",
    Some(s"""
      |WITH ${sqlCentroidCtes},
      |gtot AS (
      |  SELECT pos, sum(sx) AS gsx, sum(n) AS gn FROM pd GROUP BY 1),
      |gv AS (SELECT list((1000 * gsx) // gn ORDER BY pos) AS g,
      |              any_value(gn) AS n FROM gtot),
      |bb AS (
      |  SELECT sum(CAST(cent.nj AS HUGEINT)
      |           * list_sum(list_transform(range(1, 65), k ->
      |               (cent.cv[k] - gv.g[k]) * (cent.cv[k] - gv.g[k]))))
      |           AS b,
      |         count(*) AS k, any_value(gv.n) AS n
      |  FROM cent CROSS JOIN gv),
      |ww AS (SELECT sum(CAST(d2 AS HUGEINT)) AS w FROM dd)
      |SELECT CAST(bb.n AS BIGINT) AS n_points,
      |       CAST(bb.k AS BIGINT) AS k_labels,
      |       CAST(bb.b // 1000000 AS BIGINT) AS b_milli2,
      |       CAST(ww.w // 1000000 AS BIGINT) AS w_milli2,
      |       CAST(floor(CAST(bb.b AS DOUBLE) * CAST(bb.n - bb.k AS DOUBLE)
      |            / (CAST(ww.w AS DOUBLE) * CAST(bb.k - 1 AS DOUBLE))
      |            * 1000.0) AS BIGINT) AS ch_milli
      |FROM bb CROSS JOIN ww
      |""".stripMargin)) { (s, dir) =>
    val p = pts(s, dir)
    val pd = p.select(col("label"), posexplode(col("q")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
      .materialize() // k·64 rows: centroids AND the global sums read it
    val cent = pd
      .select(col("label"), col("pos"),
        expr("(1000 * sx) div n").as("c"), col("n"))
      .groupBy(col("label"))
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("c")))),
        s => s.getField("c")).as("cv"),
        max(col("n")).as("nj"))
    val gv = pd.groupBy(col("pos"))
      .agg(sum(col("sx")).as("gsx"), sum(col("n")).as("gn"))
      .select(col("pos"),
        expr("(1000 * gsx) div gn").as("gc"), col("gn"))
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("gc")))),
        s => s.getField("gc")).as("g"),
        max(col("gn")).as("n"))
    val bb = cent.crossJoin(broadcast(gv))
      .agg(sum(col("nj").cast("decimal(38,0)")
          * sqEuclideanLong(col("cv"), col("g"))).as("b"),
        count(lit(1)).as("k"), max(col("n")).as("n"))
    val ww = ownDist2(p, cent.materialize())
      .agg(sum(col("d2").cast("decimal(38,0)")).as("w"))
    bb.crossJoin(broadcast(ww))
      .select(col("n").as("n_points"), col("k").as("k_labels"),
        expr("CAST(b div 1000000 AS BIGINT)").as("b_milli2"),
        expr("CAST(w div 1000000 AS BIGINT)").as("w_milli2"),
        expr("""CAST(floor(CAST(b AS DOUBLE) * CAST(n - k AS DOUBLE)
             / (CAST(w AS DOUBLE) * CAST(k - 1 AS DOUBLE))
             * 1000.0) AS BIGINT)""").as("ch_milli"))
  }

  /** Xie–Beni index: XB = W / (n · min_{i≠j} d²(c_i, c_j)) — within-
    * cluster scatter against the tightest centroid separation; lower
    * is better-separated. W exact decimal, the min separation an
    * exact integer over the k² centroid dim, one pinned double. */
  def q663: Q = Q(
    "q663_xie_beni",
    Some(s"""
      |WITH ${sqlCentroidCtes},
      |ww AS (SELECT sum(CAST(d2 AS HUGEINT)) AS w, count(*) AS n FROM dd),
      |mm AS (
      |  SELECT min(list_sum(list_transform(range(1, 65), k ->
      |           (a.cv[k] - b.cv[k]) * (a.cv[k] - b.cv[k])))) AS m2,
      |         count(*) AS pairs
      |  FROM cent a JOIN cent b ON a.label != b.label)
      |SELECT CAST(ww.n AS BIGINT) AS n_points,
      |       CAST(mm.m2 AS BIGINT) AS min_sep_micro2,
      |       CAST(floor(CAST(ww.w AS DOUBLE)
      |            / (CAST(ww.n AS DOUBLE) * CAST(mm.m2 AS DOUBLE))
      |            * 1000.0) AS BIGINT) AS xb_milli
      |FROM ww CROSS JOIN mm
      |""".stripMargin)) { (s, dir) =>
    val p = pts(s, dir)
    val cent = centroids(p).materialize()
    val ww = ownDist2(p, cent)
      .agg(sum(col("d2").cast("decimal(38,0)")).as("w"),
        count(lit(1)).as("n"))
    val mm = cent.select(col("label").as("i"), col("cv").as("cva"))
      .join(cent.select(col("label").as("j"), col("cv").as("cvb")),
        col("i") =!= col("j"))
      .agg(min(sqEuclideanLong(col("cva"), col("cvb"))).as("m2"))
    ww.crossJoin(broadcast(mm))
      .select(col("n").as("n_points"), col("m2").as("min_sep_micro2"),
        expr("""CAST(floor(CAST(w AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(m2 AS DOUBLE))
             * 1000.0) AS BIGINT)""").as("xb_milli"))
  }

  /** Variation of information between the SOURCE and LANG partitions
    * of the document corpus: VI = H(src) + H(lang) − 2·I, every
    * entropy/MI term micro-nat-quantized per cell BEFORE its count-
    * weighted sum (the q229 quantized-ln discipline), floor-div by n.
    * VI is the metric two clusterings are compared with when purity's
    * degenerate optima (singletons) must not score well. */
  def q664: Q = {
    def lnq(x: String) =
      s"CAST(floor(CAST(ln($x) AS DECIMAL(28,9)) * 1000000) AS BIGINT)"
    Q("q664_variation_of_information",
      Some(s"""
        |WITH c AS (
        |  SELECT source, lang, count(*) AS nc FROM documents GROUP BY 1, 2),
        |a AS (SELECT source, sum(nc) AS na FROM c GROUP BY 1),
        |b AS (SELECT lang, sum(nc) AS nb FROM c GROUP BY 1),
        |t AS (SELECT sum(nc) AS n FROM c),
        |ha AS (SELECT -sum(na * ${lnq("CAST(na AS DOUBLE) / CAST(t.n AS DOUBLE)")})
        |              AS h FROM a CROSS JOIN t),
        |hb AS (SELECT -sum(nb * ${lnq("CAST(nb AS DOUBLE) / CAST(t.n AS DOUBLE)")})
        |              AS h FROM b CROSS JOIN t),
        |mi AS (
        |  SELECT sum(nc * ${lnq("CAST(t.n AS DOUBLE) * CAST(nc AS DOUBLE)" +
        " / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))")}) AS i
        |  FROM c JOIN a ON a.source = c.source JOIN b ON b.lang = c.lang
        |       CROSS JOIN t)
        |SELECT CAST(t.n AS BIGINT) AS n_docs,
        |       CAST(ha.h // t.n AS BIGINT) AS h_source_micro,
        |       CAST(hb.h // t.n AS BIGINT) AS h_lang_micro,
        |       CAST(mi.i // t.n AS BIGINT) AS mi_micro,
        |       CAST((ha.h + hb.h - 2 * mi.i) // t.n AS BIGINT) AS vi_micro
        |FROM t CROSS JOIN ha CROSS JOIN hb CROSS JOIN mi
        |""".stripMargin)) { (s, dir) =>
      val c = Tables.documents(s, dir)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("nc"))
        .materialize() // source×lang dim
      val a = c.groupBy(col("source")).agg(sum(col("nc")).as("na"))
      val b = c.groupBy(col("lang")).agg(sum(col("nc")).as("nb"))
      val t = c.agg(sum(col("nc")).as("n"))
      def lnqS(x: String) =
        s"CAST(floor(CAST(ln($x) AS DECIMAL(28,9)) * 1000000) AS BIGINT)"
      val ha = a.crossJoin(broadcast(t))
        .agg((-sum(col("na") * expr(lnqS(
          "CAST(na AS DOUBLE) / CAST(n AS DOUBLE)")))).as("h"))
      val hb = b.crossJoin(broadcast(t))
        .agg((-sum(col("nb") * expr(lnqS(
          "CAST(nb AS DOUBLE) / CAST(n AS DOUBLE)")))).as("h"))
      val mi = c.join(broadcast(a), Seq("source"))
        .join(broadcast(b), Seq("lang"))
        .crossJoin(broadcast(t))
        .agg(sum(col("nc") * expr(lnqS(
          "CAST(n AS DOUBLE) * CAST(nc AS DOUBLE)" +
            " / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))"))).as("i"))
      t.crossJoin(broadcast(ha.select(col("h").as("hsrc"))))
        .crossJoin(broadcast(hb.select(col("h").as("hlng"))))
        .crossJoin(broadcast(mi))
        .select(col("n").as("n_docs"),
          expr("hsrc div n").as("h_source_micro"),
          expr("hlng div n").as("h_lang_micro"),
          expr("i div n").as("mi_micro"),
          expr("(hsrc + hlng - 2 * i) div n").as("vi_micro"))
    }
  }

  /** Octant-cluster purity of the embedding labels: cells from the
    * sign pattern of the first three embedding dims (a deterministic
    * zero-cost "clustering" both engines state identically), then
    * purity (each cell votes its majority label), inverse purity, and
    * their harmonic F — all exact integer ppm. The degenerate-optima
    * pair VI (q664) exists to correct. */
  def q665: Q = Q(
    "q665_octant_purity",
    Some("""
      |WITH x AS (
      |  SELECT CAST(label AS BIGINT) AS label,
      |         4 * (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
      |         + 2 * (CASE WHEN embedding[2] > 0 THEN 1 ELSE 0 END)
      |         + (CASE WHEN embedding[3] > 0 THEN 1 ELSE 0 END) AS cell
      |  FROM embeddings),
      |cl AS (SELECT cell, label, count(*) AS nc FROM x GROUP BY 1, 2),
      |pc AS (SELECT cell, max(nc) AS mx FROM cl GROUP BY 1),
      |pl AS (SELECT label, max(nc) AS mx FROM cl GROUP BY 1),
      |t AS (SELECT count(*) AS n FROM x),
      |pu AS (SELECT (1000000 * (SELECT sum(mx) FROM pc)) // t.n AS p,
      |              (1000000 * (SELECT sum(mx) FROM pl)) // t.n AS ip,
      |              t.n AS n
      |       FROM t)
      |SELECT CAST(n AS BIGINT) AS n_points,
      |       CAST((SELECT count(*) FROM pc) AS BIGINT) AS n_cells,
      |       CAST(p AS BIGINT) AS purity_ppm,
      |       CAST(ip AS BIGINT) AS inverse_purity_ppm,
      |       CAST((2 * p * ip) // (p + ip) AS BIGINT) AS f_ppm
      |FROM pu
      |""".stripMargin)) { (s, dir) =>
    val x = Tables.embeddings(s, dir)
      .select(col("label").cast("long").as("label"),
        (lit(4) * when(col("embedding").getItem(0) > 0f, 1).otherwise(0)
          + lit(2) * when(col("embedding").getItem(1) > 0f, 1).otherwise(0)
          + when(col("embedding").getItem(2) > 0f, 1).otherwise(0))
          .cast("long").as("cell"))
    val cl = x.groupBy(col("cell"), col("label"))
      .agg(count(lit(1)).as("nc"))
      .materialize() // ≤ 80-cell dim
    val pc = cl.groupBy(col("cell")).agg(max(col("nc")).as("mx"))
    val pl = cl.groupBy(col("label")).agg(max(col("nc")).as("mx"))
    val t = cl.agg(sum(col("nc")).as("n"))
    val pcs = pc.agg(sum(col("mx")).as("sp"), count(lit(1)).as("ncells"))
    val pls = pl.agg(sum(col("mx")).as("sip"))
    t.crossJoin(broadcast(pcs)).crossJoin(broadcast(pls))
      .select(col("n").as("n_points"), col("ncells").as("n_cells"),
        expr("(1000000 * sp) div n").as("purity_ppm"),
        expr("(1000000 * sip) div n").as("inverse_purity_ppm"))
      .select(col("n_points"), col("n_cells"), col("purity_ppm"),
        col("inverse_purity_ppm"),
        expr("(2 * purity_ppm * inverse_purity_ppm)" +
          " div (purity_ppm + inverse_purity_ppm)").as("f_ppm"))
  }
}
