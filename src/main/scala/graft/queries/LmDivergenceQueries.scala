package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Round-11 source-LM divergence wave: pairwise comparisons of the
  * per-source unigram token language models over `documents` —
  * KL divergence, Jensen–Shannon divergence, cross-entropy with the
  * best/worst surrogate source, Spearman correlation of token
  * frequency ranks, and vocabulary overlap / OOV mass.
  *
  * Models are add-1 smoothed over the JOINT vocabulary:
  * P_s(w) = (c_sw + 1)/(n_s + V), on the DENSE source×vocab grid
  * (absent cells are zero counts, stated).
  *
  * Exactness: counts/grids are exact integers; every divergence
  * term is nano-floored per (pair, word) from ONE shared-text double
  * (ln matches bit-for-bit) before the order-free sum; Spearman
  * rides exact doubled midranks (2r = 2·cnt_less + cnt + 1 over the
  * count-value dim) with one shared double finish.
  *
  * Scale: ONE documents scan tokenizes and counts (map-side
  * combine); everything after is (sources × vocab)-dim algebra —
  * the pair frames are broadcast-sized. */
object LmDivergenceQueries {

  val all: Seq[Q] = Seq(q1161, q1162, q1163, q1164, q1165)

  /** Oracle dense grid CTEs: dn(src, w, c), tot(src, n), vv(v). */
  private def sqlDn: String = """
    |tk AS (SELECT source AS src,
    |              unnest(regexp_split_to_array(trim(text), '\s+')) AS w
    |       FROM documents WHERE trim(text) <> ''),
    |st AS (SELECT src, w, count(*) AS c FROM tk GROUP BY 1, 2),
    |vv AS (SELECT count(DISTINCT w) AS v FROM st),
    |dn AS (SELECT s.src, voc.w, coalesce(st.c, 0) AS c
    |       FROM (SELECT DISTINCT src FROM st) s
    |       CROSS JOIN (SELECT DISTINCT w FROM st) voc
    |       LEFT JOIN st ON st.src = s.src AND st.w = voc.w),
    |tot AS (SELECT src, sum(c) AS n FROM dn GROUP BY 1)""".stripMargin

  /** Spark twin: dense (src, w, c) plus totals and vocab size. */
  private def dn(s: SparkSession, dir: String): DataFrame = {
    // ONE documents tokenize+count pass, SpineCache-backed (the
    // oracle keeps the inline scan: gate proves spine ≡ scratch)
    val st = graft.sources.SpineCache.table(s, dir,
      "source_token_counts", Seq("documents")) {
      Tables.documents(s, dir)
        .where(trim(col("text")) =!= "")
        .select(col("source").as("src"),
          explode(expr("split(trim(text), '\\\\s+')")).as("w"))
        .groupBy(col("src"), col("w")).agg(count(lit(1)).as("c"))
    }
    val srcs = st.select(col("src")).distinct()
    val voc = st.select(col("w").as("wv")).distinct()
    srcs.crossJoin(voc)
      .join(st.select(col("src").as("srcj"), col("w").as("wj"),
        col("c").as("cj")),
        col("srcj") === col("src") && col("wj") === col("wv"),
        "left_outer")
      .select(col("src"), col("wv").as("w"),
        coalesce(col("cj"), lit(0L)).as("c"))
  }

  /** Shared smoothed-probability text over (c?, n?, v). */
  private def p(c: String, n: String): String =
    s"((CAST($c AS DOUBLE) + 1.0) / (CAST($n AS DOUBLE)" +
      " + CAST(v AS DOUBLE)))"

  /** Oracle pair frame pr over ordered pairs a ≠ b:
    * (sa, sb, w, ca, cb, na, nb, v). */
  private def sqlPr: String = s"""
    |${sqlDn},
    |pr AS (SELECT a.src AS sa, b.src AS sb, a.w, a.c AS ca, b.c AS cb,
    |              ta.n AS na, tb.n AS nb, vv.v
    |       FROM dn a JOIN dn b ON a.w = b.w AND a.src != b.src
    |       JOIN tot ta ON ta.src = a.src
    |       JOIN tot tb ON tb.src = b.src
    |       CROSS JOIN vv)""".stripMargin

  /** Spark twin of [[sqlPr]]. */
  private def pr(s: SparkSession, dir: String): DataFrame = {
    val d = dn(s, dir)
    val tot = d.groupBy(col("src")).agg(sum(col("c")).as("n"))
    val vv = d.select(col("w")).distinct().agg(count(lit(1)).as("v"))
    val a = d.select(col("src").as("sa"), col("w"), col("c").as("ca"))
      .join(tot.select(col("src").as("sa"), col("n").as("na")), "sa")
    val b = d.select(col("src").as("sb"), col("w").as("wb"),
      col("c").as("cb"))
      .join(tot.select(col("src").as("sb"), col("n").as("nb")), "sb")
    a.join(b, col("w") === col("wb") && col("sa") =!= col("sb"))
      .crossJoin(broadcast(vv))
      .select(col("sa"), col("sb"), col("w"), col("ca"), col("cb"),
        col("na"), col("nb"), col("v"))
  }

  /** Pairwise KL(P_a ‖ P_b) matrix (ordered pairs). */
  def q1161: Q = {
    val term = s"(${p("ca", "na")} * ln(${p("ca", "na")}" +
      s" / ${p("cb", "nb")}))"
    Q("q1161_kl_divergence_matrix",
      Some(s"""
        |WITH ${sqlPr},
        |tm AS (SELECT sa, sb,
        |         CAST(floor(1000000000.0 * $term) AS BIGINT) AS t
        |       FROM pr)
        |SELECT sa AS src_a, sb AS src_b,
        |       CAST(sum(t) // 1000 AS BIGINT) AS kl_micro
        |FROM tm GROUP BY 1, 2 ORDER BY src_a, src_b
        |""".stripMargin)) { (s, dir) =>
      pr(s, dir)
        .select(col("sa"), col("sb"),
          expr(s"CAST(floor(1000000000.0 * $term) AS BIGINT)").as("t"))
        .groupBy(col("sa").as("src_a"), col("sb").as("src_b"))
        .agg(expr("CAST(sum(t) div 1000 AS BIGINT)").as("kl_micro"))
        .orderBy(col("src_a"), col("src_b"))
    }
  }

  /** Jensen–Shannon divergence (unordered pairs): ½KL(a‖m)+½KL(b‖m)
    * with m the midpoint model. */
  def q1162: Q = {
    val m = s"((${p("ca", "na")} + ${p("cb", "nb")}) / 2.0)"
    val term = s"(0.5 * ${p("ca", "na")} * ln(${p("ca", "na")} / $m)" +
      s" + 0.5 * ${p("cb", "nb")} * ln(${p("cb", "nb")} / $m))"
    Q("q1162_js_divergence_matrix",
      Some(s"""
        |WITH ${sqlPr},
        |tm AS (SELECT sa, sb,
        |         CAST(floor(1000000000.0 * $term) AS BIGINT) AS t
        |       FROM pr WHERE sa < sb)
        |SELECT sa AS src_a, sb AS src_b,
        |       CAST(sum(t) // 1000 AS BIGINT) AS js_micro
        |FROM tm GROUP BY 1, 2 ORDER BY src_a, src_b
        |""".stripMargin)) { (s, dir) =>
      pr(s, dir).where(col("sa") < col("sb"))
        .select(col("sa"), col("sb"),
          expr(s"CAST(floor(1000000000.0 * $term) AS BIGINT)").as("t"))
        .groupBy(col("sa").as("src_a"), col("sb").as("src_b"))
        .agg(expr("CAST(sum(t) div 1000 AS BIGINT)").as("js_micro"))
        .orderBy(col("src_a"), col("src_b"))
    }
  }

  /** Cross-entropy of each source under the others: the best and
    * worst surrogate model per source (ties to the lexicographically
    * smallest surrogate, stated). */
  def q1163: Q = {
    val term = s"(${p("ca", "na")} * ln(${p("cb", "nb")}))"
    Q("q1163_surrogate_cross_entropy",
      Some(s"""
        |WITH ${sqlPr},
        |ce AS (SELECT sa, sb,
        |         -sum(CAST(floor(1000000000.0 * $term) AS BIGINT))
        |           // 1000 AS ce_micro
        |       FROM pr GROUP BY 1, 2),
        |rk AS (SELECT sa, sb, ce_micro,
        |         row_number() OVER (PARTITION BY sa
        |           ORDER BY ce_micro, sb) AS rbest,
        |         row_number() OVER (PARTITION BY sa
        |           ORDER BY ce_micro DESC, sb) AS rworst
        |       FROM ce)
        |SELECT sa AS src,
        |       min(CASE WHEN rbest = 1 THEN sb END) AS best_surrogate,
        |       CAST(min(CASE WHEN rbest = 1 THEN ce_micro END) AS BIGINT)
        |         AS best_ce_micro,
        |       min(CASE WHEN rworst = 1 THEN sb END) AS worst_surrogate,
        |       CAST(min(CASE WHEN rworst = 1 THEN ce_micro END) AS BIGINT)
        |         AS worst_ce_micro
        |FROM rk GROUP BY 1 ORDER BY src
        |""".stripMargin)) { (s, dir) =>
      val ce = pr(s, dir)
        .select(col("sa"), col("sb"),
          expr(s"CAST(floor(1000000000.0 * $term) AS BIGINT)").as("t"))
        .groupBy(col("sa"), col("sb"))
        .agg(expr("CAST(-sum(t) div 1000 AS BIGINT)").as("ce_micro"))
      val rk = ce
        .withColumn("rbest", row_number().over(Window
          .partitionBy(col("sa")).orderBy(col("ce_micro"), col("sb"))))
        .withColumn("rworst", row_number().over(Window
          .partitionBy(col("sa"))
          .orderBy(col("ce_micro").desc, col("sb"))))
      rk.groupBy(col("sa").as("src"))
        .agg(min(when(col("rbest") === 1, col("sb")))
          .as("best_surrogate"),
          min(when(col("rbest") === 1, col("ce_micro")))
            .as("best_ce_micro"),
          min(when(col("rworst") === 1, col("sb")))
            .as("worst_surrogate"),
          min(when(col("rworst") === 1, col("ce_micro")))
            .as("worst_ce_micro"))
        .orderBy(col("src"))
    }
  }

  /** Spearman correlation of token-frequency ranks per unordered
    * pair (doubled midranks over the count-value dim). */
  def q1164: Q = {
    val rho = "((CAST(nw AS DOUBLE) * CAST(sxy AS DOUBLE)" +
      " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))" +
      " / sqrt((CAST(nw AS DOUBLE) * CAST(sxx AS DOUBLE)" +
      " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))" +
      " * (CAST(nw AS DOUBLE) * CAST(syy AS DOUBLE)" +
      " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))"
    Q("q1164_rank_corr_matrix",
      Some(s"""
        |WITH ${sqlDn},
        |vd AS (SELECT src, c, count(*) AS cnt FROM dn GROUP BY 1, 2),
        |vr AS (SELECT src, c, cnt,
        |         CAST(coalesce(sum(cnt) OVER (PARTITION BY src ORDER BY c
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |         AS BIGINT) AS less
        |       FROM vd),
        |r2 AS (SELECT dn.src, dn.w, 2 * vr.less + vr.cnt + 1 AS dr
        |       FROM dn JOIN vr ON vr.src = dn.src AND vr.c = dn.c),
        |pp AS (SELECT a.src AS sa, b.src AS sb, a.dr AS x, b.dr AS y
        |       FROM r2 a JOIN r2 b ON a.w = b.w AND a.src < b.src),
        |mo AS (SELECT sa, sb, count(*) AS nw, sum(x) AS sx, sum(y) AS sy,
        |         sum(CAST(x AS BIGINT) * x) AS sxx,
        |         sum(CAST(x AS BIGINT) * y) AS sxy,
        |         sum(CAST(y AS BIGINT) * y) AS syy
        |       FROM pp GROUP BY 1, 2)
        |SELECT sa AS src_a, sb AS src_b,
        |       CAST(floor(1000000.0 * $rho) AS BIGINT) AS spearman_micro
        |FROM mo ORDER BY src_a, src_b
        |""".stripMargin)) { (s, dir) =>
      val d = dn(s, dir)
      val vd = d.groupBy(col("src"), col("c")).agg(count(lit(1)).as("cnt"))
      val vr = vd.withColumn("less",
        coalesce(sum(col("cnt")).over(Window.partitionBy(col("src"))
          .orderBy(col("c"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val r2 = d.join(vr.select(col("src").as("srcv"), col("c").as("cv"),
        col("cnt"), col("less")),
        col("srcv") === col("src") && col("cv") === col("c"))
        .select(col("src"), col("w"),
          (lit(2) * col("less") + col("cnt") + 1).as("dr"))
      val a = r2.select(col("src").as("sa"), col("w"), col("dr").as("x"))
      val b = r2.select(col("src").as("sb"), col("w").as("wb"),
        col("dr").as("y"))
      a.join(b, col("w") === col("wb") && col("sa") < col("sb"))
        .groupBy(col("sa"), col("sb"))
        .agg(count(lit(1)).as("nw"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(expr("CAST(x AS BIGINT) * x")).as("sxx"),
          sum(expr("CAST(x AS BIGINT) * y")).as("sxy"),
          sum(expr("CAST(y AS BIGINT) * y")).as("syy"))
        .select(col("sa").as("src_a"), col("sb").as("src_b"),
          expr(s"CAST(floor(1000000.0 * $rho) AS BIGINT)")
            .as("spearman_micro"))
        .orderBy(col("src_a"), col("src_b"))
    }
  }

  /** Vocabulary overlap per ordered pair: Jaccard of supports and
    * the OOV token mass of a under b's support. */
  def q1165: Q = Q(
    "q1165_vocab_overlap",
    Some(s"""
      |WITH ${sqlPr},
      |ag AS (SELECT sa, sb,
      |         sum(CASE WHEN ca > 0 AND cb > 0 THEN 1 ELSE 0 END)
      |           AS nboth,
      |         sum(CASE WHEN ca > 0 OR cb > 0 THEN 1 ELSE 0 END)
      |           AS either,
      |         sum(CASE WHEN cb = 0 THEN ca ELSE 0 END) AS oovmass,
      |         max(na) AS na
      |       FROM pr GROUP BY 1, 2)
      |SELECT sa AS src_a, sb AS src_b,
      |       CAST(nboth AS BIGINT) AS shared_vocab,
      |       CAST((1000000 * nboth) // either AS BIGINT) AS jaccard_ppm,
      |       CAST((1000000 * oovmass) // na AS BIGINT) AS oov_mass_ppm
      |FROM ag ORDER BY src_a, src_b
      |""".stripMargin)) { (s, dir) =>
    pr(s, dir)
      .groupBy(col("sa"), col("sb"))
      .agg(sum(when(col("ca") > 0 && col("cb") > 0, 1L).otherwise(0L))
        .as("nboth"),
        sum(when(col("ca") > 0 || col("cb") > 0, 1L).otherwise(0L))
          .as("either"),
        sum(when(col("cb") === 0, col("ca")).otherwise(0L))
          .as("oovmass"),
        max(col("na")).as("na"))
      .select(col("sa").as("src_a"), col("sb").as("src_b"),
        col("nboth").cast("long").as("shared_vocab"),
        expr("CAST((1000000 * nboth) div either AS BIGINT)")
          .as("jaccard_ppm"),
        expr("CAST((1000000 * oovmass) div na AS BIGINT)")
          .as("oov_mass_ppm"))
      .orderBy(col("src_a"), col("src_b"))
  }
}
