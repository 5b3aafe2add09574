package graft.queries

import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables
import graft.text.TextAnalysis
import PipelineQueries.{sqlSaltedHash, sqlTokens}

/** Round-7 corpus-statistics wave: term burstiness, per-language
  * stopword coverage, the rank-window SQL family (ntile/percent_rank/
  * cume_dist), inter-label embedding-centroid cosines, and the KMV
  * distinct sketch — each exact-integer or floor-quantized with a
  * DuckDB oracle replaying identical arithmetic.
  */
object CorpusStatsQueries {

  val all: Seq[Q] = Seq(q281, q282, q283, q284, q285)

  /** Term burstiness for the top-30 terms by collection frequency:
    * cf (occurrences) vs df (documents containing), ratio in exact
    * milli — burst ≫ 1000 marks terms that pile into few documents
    * (boilerplate, code dumps) vs spread evenly (function words). The
    * term dim never globally sorts: distributed top-k via
    * orderBy.limit. */
  def q281: Q = Q(
    "q281_term_burstiness",
    Some(s"""
      |WITH t AS (
      |  SELECT doc_id, unnest(${sqlTokens("text")}) AS w
      |  FROM documents WHERE text IS NOT NULL),
      |f AS (
      |  SELECT w, count(*) AS cf, count(DISTINCT doc_id) AS df
      |  FROM t GROUP BY w),
      |top AS (SELECT w, cf, df FROM f ORDER BY cf DESC, w LIMIT 30)
      |SELECT w, CAST(cf AS BIGINT) AS cf, CAST(df AS BIGINT) AS df,
      |       CAST((1000 * cf) // df AS BIGINT) AS burst_milli
      |FROM top ORDER BY cf DESC, w
      |""".stripMargin)) { (s, dir) =>
    Tables.documents(s, dir)
      .where(col("text").isNotNull)
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("cf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("cf").desc, col("w")).limit(30)
      .withColumn("burst_milli", expr("(1000 * cf) div df"))
      .orderBy(col("cf").desc, col("w"))
  }

  /** Stopword coverage per language, each language scored against its
    * OWN stopword list (a broadcast (lang, word) dim joined on both
    * keys): the lang-ID calibration number — healthy natural text
    * sits in a stable coverage band; near-zero coverage on a language
    * flags mislabeled or templated documents. */
  def q282: Q = {
    val swRows = TextAnalysis.LangStopwords
      .flatMap { case (l, ws) => ws.map(w => s"('$l', '$w')") }
      .mkString(", ")
    Q("q282_stopword_coverage",
      Some(s"""
        |WITH t AS (
        |  SELECT lang, unnest(${sqlTokens("text")}) AS w
        |  FROM documents WHERE text IS NOT NULL),
        |sw AS (SELECT * FROM (VALUES $swRows) AS v(lang, w)),
        |m AS (
        |  SELECT t.lang, count(*) AS n_tokens,
        |         sum(CASE WHEN sw.w IS NOT NULL THEN 1 ELSE 0 END)
        |           AS n_stop
        |  FROM t LEFT JOIN sw ON t.lang = sw.lang AND t.w = sw.w
        |  GROUP BY t.lang)
        |SELECT lang, CAST(n_tokens AS BIGINT) AS n_tokens,
        |       CAST(n_stop AS BIGINT) AS n_stop,
        |       CAST((1000000 * n_stop) // n_tokens AS BIGINT) AS stop_ppm
        |FROM m ORDER BY lang
        |""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val sw = TextAnalysis.LangStopwords
        .flatMap { case (l, ws) => ws.map(w => (l, w)) }
        .toDF("__sw_lang", "__sw_w")
      Tables.documents(s, dir)
        .where(col("text").isNotNull)
        .select(col("lang"),
          explode(TextAnalysis.tokens(col("text"))).as("w"))
        .join(broadcast(sw),
          col("lang") === col("__sw_lang") && col("w") === col("__sw_w"),
          "left")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("__sw_w").isNotNull, 1L).otherwise(0L)).as("n_stop"))
        .withColumn("stop_ppm", expr("(1000000 * n_stop) div n_tokens"))
        .orderBy(col("lang"))
    }
  }

  /** The rank-window SQL family in one face — ntile quartiles,
    * percent_rank, cume_dist per market segment over account balance
    * (custkey tie-break makes every rank total, so ntile's bucket
    * boundaries and both rationals are deterministic cross-engine;
    * the rationals floor-quantize to ppm). Segment-partitioned
    * windows — the parallel shape. */
  def q283: Q = Q(
    "q283_rank_window_family",
    Some("""
      |SELECT c_mktsegment AS segment, c_custkey,
      |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |       CAST(floor(CAST(percent_rank() OVER w AS DECIMAL(18,9))
      |            * 1000000) AS BIGINT) AS pr_ppm,
      |       CAST(floor(CAST(cume_dist() OVER w AS DECIMAL(18,9))
      |            * 1000000) AS BIGINT) AS cd_ppm
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment
      |             ORDER BY c_acctbal, c_custkey)
      |ORDER BY segment, c_custkey
      |""".stripMargin)) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    def q6(c: org.apache.spark.sql.Column) =
      floor(c.cast("decimal(18,9)") * 1000000).cast("long")
    Tables.customer(s, dir)
      .select(col("c_mktsegment").as("segment"), col("c_custkey"),
        ntile(4).over(w).cast("long").as("quartile"),
        q6(percent_rank().over(w)).as("pr_ppm"),
        q6(cume_dist().over(w)).as("cd_ppm"))
      .orderBy(col("segment"), col("c_custkey"))
  }

  /** Inter-label embedding-centroid cosine matrix: per-label summed
    * milli-quantized vectors (integer-exact — per-element floor(v·1000)
    * before any sum, so the reduction is order-free), then all label
    * pairs' cosines from exact integer dot/norm sums with ONE final
    * double division, floor-quantized to milli. Cosine of sums equals
    * cosine of centroids (scale-invariant), so no division per dim.
    * The label-confusability map for an embedding audit. */
  def q284: Q = Q(
    "q284_label_centroid_cosine",
    Some("""
      |WITH q AS (
      |  SELECT label, u.d AS dim,
      |         CAST(floor(CAST(embedding[u.d + 1] AS DOUBLE) * 1000)
      |              AS BIGINT) AS q
      |  FROM embeddings, unnest(range(0, 64)) AS u(d)),
      |s AS (SELECT label, dim, sum(q) AS s FROM q GROUP BY 1, 2),
      |p AS (
      |  SELECT a.label AS la, b.label AS lb,
      |         sum(CAST(a.s AS HUGEINT) * b.s) AS dot,
      |         sum(CAST(a.s AS HUGEINT) * a.s) AS na2,
      |         sum(CAST(b.s AS HUGEINT) * b.s) AS nb2
      |  FROM s a JOIN s b ON a.dim = b.dim AND a.label < b.label
      |  GROUP BY 1, 2)
      |SELECT CAST(la AS BIGINT) AS label_a, CAST(lb AS BIGINT) AS label_b,
      |       CAST(dot AS BIGINT) AS dot,
      |       CASE WHEN na2 > 0 AND nb2 > 0 THEN
      |         CAST(floor(CAST(CAST(dot AS DOUBLE)
      |              / (sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE)))
      |              AS DECIMAL(18,9)) * 1000) AS BIGINT)
      |       END AS cos_milli
      |FROM p ORDER BY label_a, label_b
      |""".stripMargin)) { (s, dir) =>
    val d38 = "decimal(38,0)"
    val q = Tables.embeddings(s, dir)
      .select(col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("label"), col("dim"),
        floor(col("v").cast("double") * 1000).cast("long").as("q"))
    val sums = q.groupBy(col("label"), col("dim"))
      .agg(sum(col("q")).as("s"))
      .materialize() // the label×dim dim feeds both join sides
    // self-join of a derived frame: rename the right side outright
    val b = sums.select(col("label").as("__lb"), col("dim").as("__bdim"),
      col("s").as("__bs"))
    sums.join(b, col("dim") === col("__bdim") && col("label") < col("__lb"))
      .groupBy(col("label").as("label_a"), col("__lb").as("label_b"))
      .agg(sum(col("s").cast(d38) * col("__bs")).cast(d38).as("__dot"),
        sum(col("s").cast(d38) * col("s")).cast(d38).as("__na2"),
        sum(col("__bs").cast(d38) * col("__bs")).cast(d38).as("__nb2"))
      .select(col("label_a"), col("label_b"),
        col("__dot").cast("long").as("dot"),
        when(col("__na2") > 0 && col("__nb2") > 0,
          floor((col("__dot").cast("double") /
            (sqrt(col("__na2").cast("double")) *
              sqrt(col("__nb2").cast("double"))))
            .cast("decimal(18,9)") * 1000).cast("long"))
          .as("cos_milli"))
      .orderBy(col("label_a"), col("label_b"))
  }

  /** KMV distinct sketch vs exact (operators/KmvSketch): per source
    * the k=8 minimum-hash estimate next to the true distinct token
    * count with its error in ppm — the third cardinality estimator
    * (HLL q143, LinearCount q135) with the exact-auditable k-row
    * summary contract; the oracle replays hash, order statistic, and
    * the one pinned double division verbatim. */
  def q285: Q = {
    val k = 8
    Q("q285_kmv_distinct",
      Some(s"""
        |WITH t AS (
        |  SELECT DISTINCT source, w FROM (
        |    SELECT source, unnest(${sqlTokens("text")}) AS w
        |    FROM documents WHERE text IS NOT NULL)),
        |h AS (
        |  SELECT source, w, (${sqlSaltedHash("w", "kmv")}) AS h
        |  FROM t),
        |r AS (
        |  SELECT source, h,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY h, w) AS rn,
        |         count(*) OVER (PARTITION BY source) AS n
        |  FROM h),
        |kth AS (SELECT source, h AS kth FROM r WHERE rn = $k),
        |ex AS (SELECT source, count(*) AS exact FROM t GROUP BY source),
        |e AS (
        |  SELECT ex.source, ex.exact,
        |         ${graft.operators.KmvSketch.sqlEstimate("kth.kth", "ex.exact", k)}
        |           AS est
        |  FROM ex LEFT JOIN kth ON ex.source = kth.source)
        |SELECT source, CAST(exact AS BIGINT) AS exact_distinct,
        |       CAST(est AS BIGINT) AS kmv_estimate,
        |       CAST((1000000 * abs(est - exact)) // exact AS BIGINT)
        |         AS err_ppm
        |FROM e ORDER BY source
        |""".stripMargin)) { (s, dir) =>
      graft.operators.KmvSketch.estimate(
          Tables.documents(s, dir)
            .where(col("text").isNotNull)
            .select(col("source"),
              explode(TextAnalysis.tokens(col("text"))).as("w")),
          keys = Seq("source"), valueCol = "w", k = k, salt = "kmv")
        .select(col("source"),
          col("exact_distinct"),
          col("kmv_estimate"),
          expr("(1000000 * abs(kmv_estimate - exact_distinct)) " +
            "div exact_distinct").as("err_ppm"))
        .orderBy(col("source"))
    }
  }
}
