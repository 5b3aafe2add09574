package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-8 evaluation/fairness wave: split-conformal prediction
  * intervals with EXACT integer residual arithmetic, an
  * equalized-odds audit across customer regions, ERR@10 retrieval
  * quality, the Youden-J optimal threshold over the fact-scaled score
  * dim (bucket-parallel ECDF), and Krippendorff's α for two
  * deterministic raters. Train/calibrate/test splits are
  * deterministic key residues — both engines see identical splits. */
object EvalFairQueries {

  val all: Seq[Q] = Seq(q606, q607, q608, q609, q610)

  /** Split-conformal 90% prediction interval for order totalprice from
    * total quantity: OLS on the orderkey%4 ∈ {0,2} half IN EXACT
    * RATIONALS (residuals kept den-scaled, never divided), the
    * calibration quarter's ⌈0.9(n+1)⌉-th absolute residual as q̂, and
    * the honest coverage rate on the held-out quarter. The q̂ order
    * statistic rides bucket-parallel globalRankCum over log₂ buckets
    * (the calibration dim grows with the data). Finite-sample valid
    * regardless of the model being wrong — which it is here. */
  def q606: Q = Q(
    "q606_split_conformal_coverage",
    Some("""
      |WITH o AS (
      |  SELECT o.o_orderkey AS id, o.o_orderkey % 4 AS sp,
      |         CAST(any_value(o.o_totalprice) * 100 AS HUGEINT) AS y,
      |         sum(CAST(floor(l.l_quantity + 0.5) AS BIGINT)) AS x
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |  GROUP BY 1, 2),
      |tr AS (
      |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |         sum(CAST(x AS HUGEINT) * x) AS sxx,
      |         sum(CAST(x AS HUGEINT) * y) AS sxy
      |  FROM o WHERE sp IN (0, 2)),
      |fit AS (
      |  SELECT CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den,
      |         CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS nb,
      |         CAST(sy AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sxy AS na,
      |         n AS n_train
      |  FROM tr),
      |cal AS (
      |  SELECT abs(fit.den * o.y - fit.nb * o.x - fit.na) AS r
      |  FROM o CROSS JOIN fit WHERE o.sp = 1),
      |nc AS (SELECT count(*) AS n_cal FROM cal),
      |kk AS (SELECT least((9 * (n_cal + 1) + 9) // 10, n_cal) AS k
      |       FROM nc),
      |qh AS (
      |  SELECT max(CASE WHEN rn = kk.k THEN r END) AS qhat
      |  FROM (SELECT r, row_number() OVER (ORDER BY r) AS rn FROM cal)
      |  CROSS JOIN kk),
      |ts AS (
      |  SELECT count(*) AS n_test,
      |         count(*) FILTER (
      |           abs(fit.den * o.y - fit.nb * o.x - fit.na) <= qh.qhat)
      |           AS covered
      |  FROM o CROSS JOIN fit CROSS JOIN qh WHERE o.sp = 3)
      |SELECT CAST(fit.n_train AS BIGINT) AS n_train,
      |       CAST(nc.n_cal AS BIGINT) AS n_cal,
      |       CAST(ts.n_test AS BIGINT) AS n_test,
      |       CAST(floor(CAST(qh.qhat AS DOUBLE)
      |         / CAST(fit.den AS DOUBLE)) AS BIGINT) AS qhat_cents,
      |       CAST((1000 * ts.covered) // ts.n_test AS BIGINT)
      |         AS coverage_permille
      |FROM fit CROSS JOIN nc CROSS JOIN qh CROSS JOIN ts
      |""".stripMargin)) { (s, dir) =>
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey").as("id"),
        expr("o_orderkey % 4").as("sp"),
        expr("CAST(o_totalprice * 100 AS DECIMAL(38,0))").as("y"))
      .join(Tables.lineitem(s, dir).select(col("l_orderkey"),
        expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("q")),
        col("id") === col("l_orderkey"))
      .groupBy(col("id"), col("sp"), col("y")).agg(sum(col("q")).as("x"))
      .materialize() // train moments, calibration, and test read it
    val fit = o.where(col("sp").isin(0, 2))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
      .select(col("n").as("n_train"),
        expr("CAST(n AS DECIMAL(38,0)) * sxx" +
          " - CAST(sx AS DECIMAL(38,0)) * sx").as("den"),
        expr("CAST(n AS DECIMAL(38,0)) * sxy" +
          " - CAST(sx AS DECIMAL(38,0)) * sy").as("nb"),
        expr("CAST(sy AS DECIMAL(38,0)) * sxx" +
          " - CAST(sx AS DECIMAL(38,0)) * sxy").as("na"))
    val cal = o.where(col("sp") === 1).crossJoin(broadcast(fit))
      .select(abs(col("den") * col("y") - col("nb") * col("x")
        - col("na")).as("r"))
      .materialize()
    val nCal = cal.count()
    val k = math.min((9L * (nCal + 1) + 9) / 10, nCal)
    // k-th smallest den-scaled residual, bucket-parallel: rank over
    // log2 buckets of r (the calibration dim grows with the data)
    val qh = graft.dedup.SortedNeighborhood.globalRankCum(
        cal.withColumn("__bkt",
          expr("CAST(floor(log2(CAST(r AS DOUBLE) + 1.0)) AS BIGINT)")),
        idCol = "r", bucketCol = "__bkt", tieCols = Nil)
      .where(col("__rank") === k)
      .agg(max(col("r")).as("qhat")) // ties: any rank-k row has THE value
    val ts = o.where(col("sp") === 3).crossJoin(broadcast(fit))
      .crossJoin(broadcast(qh))
      .agg(count(lit(1)).as("n_test"),
        count(when(abs(col("den") * col("y") - col("nb") * col("x")
          - col("na")) <= col("qhat"), 1)).as("covered"))
    val ncDf = cal.agg(count(lit(1)).as("n_cal"))
    fit.crossJoin(broadcast(ncDf)).crossJoin(broadcast(qh))
      .crossJoin(broadcast(ts))
      .select(col("n_train"), col("n_cal"), col("n_test"),
        expr("CAST(floor(CAST(qhat AS DOUBLE) / CAST(den AS DOUBLE))" +
          " AS BIGINT)").as("qhat_cents"),
        expr("CAST((1000 * covered) div n_test AS BIGINT)")
          .as("coverage_permille"))
  }

  /** Equalized-odds audit of a "high-risk order" rule (totalprice >
    * $300k) against the returned-line ground truth, across customer
    * regions: per-region TPR/FPR in permille plus the max−min gaps —
    * the two-sided fairness check a single accuracy number hides.
    * Exact confusion counts; region dim is 5 rows. */
  def q607: Q = Q(
    "q607_equalized_odds_audit",
    Some("""
      |WITH ol AS (
      |  SELECT o.o_orderkey AS id, any_value(c.c_nationkey) AS nk,
      |         CASE WHEN any_value(o.o_totalprice) > 300000
      |              THEN 1 ELSE 0 END AS pred,
      |         max(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
      |           AS truth
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  GROUP BY 1),
      |r AS (
      |  SELECT n.n_regionkey AS region_key,
      |         sum(CASE WHEN pred = 1 AND truth = 1 THEN 1 ELSE 0 END)
      |           AS tp,
      |         sum(CASE WHEN pred = 1 AND truth = 0 THEN 1 ELSE 0 END)
      |           AS fp,
      |         sum(CASE WHEN pred = 0 AND truth = 1 THEN 1 ELSE 0 END)
      |           AS fn,
      |         sum(CASE WHEN pred = 0 AND truth = 0 THEN 1 ELSE 0 END)
      |           AS tn
      |  FROM ol JOIN nation n ON ol.nk = n.n_nationkey
      |  GROUP BY 1),
      |rr AS (
      |  SELECT region_key, tp, fp, fn, tn,
      |         (1000 * tp) // (tp + fn) AS tpr_permille,
      |         (1000 * fp) // (fp + tn) AS fpr_permille
      |  FROM r),
      |gaps AS (
      |  SELECT max(tpr_permille) - min(tpr_permille) AS tpr_gap,
      |         max(fpr_permille) - min(fpr_permille) AS fpr_gap
      |  FROM rr)
      |SELECT CAST(region_key AS BIGINT) AS region_key,
      |       CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
      |       CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
      |       CAST(tpr_permille AS BIGINT) AS tpr_permille,
      |       CAST(fpr_permille AS BIGINT) AS fpr_permille,
      |       CAST(gaps.tpr_gap AS BIGINT) AS tpr_gap_permille,
      |       CAST(gaps.fpr_gap AS BIGINT) AS fpr_gap_permille
      |FROM rr CROSS JOIN gaps ORDER BY region_key
      |""".stripMargin)) { (s, dir) =>
    val ol = Tables.orders(s, dir)
      .join(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_returnflag")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("c_nationkey"),
        when(col("o_totalprice") > 300000, 1).otherwise(0).as("pred"))
      .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0))
        .as("truth"))
    val rr = ol.join(Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_regionkey").as("region_key")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("region_key"))
      .agg(sum(when(col("pred") === 1 && col("truth") === 1, 1L)
        .otherwise(0L)).as("tp"),
        sum(when(col("pred") === 1 && col("truth") === 0, 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("pred") === 0 && col("truth") === 1, 1L)
          .otherwise(0L)).as("fn"),
        sum(when(col("pred") === 0 && col("truth") === 0, 1L)
          .otherwise(0L)).as("tn"))
      .select(col("region_key"), col("tp"), col("fp"), col("fn"),
        col("tn"),
        expr("(1000 * tp) div (tp + fn)").as("tpr_permille"),
        expr("(1000 * fp) div (fp + tn)").as("fpr_permille"))
      .materialize() // 5-row region dim feeds the gaps AND the output
    val gaps = rr.agg(
      (max(col("tpr_permille")) - min(col("tpr_permille"))).as("tpr_gap"),
      (max(col("fpr_permille")) - min(col("fpr_permille"))).as("fpr_gap"))
    rr.crossJoin(broadcast(gaps))
      .select(col("region_key").cast("long").as("region_key"), col("tp"),
        col("fp"), col("fn"), col("tn"), col("tpr_permille"),
        col("fpr_permille"), col("tpr_gap").as("tpr_gap_permille"),
        col("fpr_gap").as("fpr_gap_permille"))
      .orderBy(col("region_key"))
  }

  /** ERR@10 (expected reciprocal rank) of a proxy retrieval run:
    * relevance grade g = min(3, count of "join" in the doc), ranking
    * by count of "scan" (desc, doc_id tie-break) — a deliberately
    * imperfect ranker, which is what ERR exists to measure. Top-10 via
    * orderBy().limit, then the cascade fold ERR += mass·R/r,
    * mass ×= (1−R) with R = (2^g−1)/8 replayed as the IDENTICAL
    * integer-micro recurrence in both engines (floor at every step). */
  def q608: Q = Q(
    "q608_expected_reciprocal_rank",
    Some(s"""
      |WITH t AS (
      |  SELECT doc_id,
      |         len(list_filter(${PipelineQueries.sqlTokens("text")},
      |             w -> w = 'join')) AS rel,
      |         len(list_filter(${PipelineQueries.sqlTokens("text")},
      |             w -> w = 'scan')) AS prox
      |  FROM documents WHERE text IS NOT NULL),
      |top AS (
      |  SELECT doc_id, least(rel, 3) AS g,
      |         row_number() OVER (ORDER BY prox DESC, doc_id) AS r
      |  FROM t ORDER BY prox DESC, doc_id LIMIT 10),
      |gl AS (SELECT list({'err': CAST(0 AS BIGINT),
      |                    'mass': CAST(0 AS BIGINT),
      |                    'r': CAST(0 AS BIGINT), 'g': g}
      |                   ORDER BY r) AS gs FROM top),
      |fold AS (
      |  SELECT list_reduce(
      |    list_prepend({'err': CAST(0 AS BIGINT),
      |                  'mass': CAST(1000000 AS BIGINT),
      |                  'r': CAST(0 AS BIGINT),
      |                  'g': CAST(0 AS BIGINT)}, gs),
      |    (a, e) -> {
      |      'err': a.err + (a.mass * (CASE e.g WHEN 0 THEN 0
      |               WHEN 1 THEN 1 WHEN 2 THEN 3 ELSE 7 END))
      |               // (8 * (a.r + 1)),
      |      'mass': (a.mass * (8 - (CASE e.g WHEN 0 THEN 0 WHEN 1 THEN 1
      |               WHEN 2 THEN 3 ELSE 7 END))) // 8,
      |      'r': a.r + 1, 'g': CAST(0 AS BIGINT)}) AS st
      |  FROM gl)
      |SELECT CAST((SELECT count(*) FROM top) AS BIGINT) AS k,
      |       CAST(st.err AS BIGINT) AS err_micro,
      |       CAST(st.mass AS BIGINT) AS leftover_mass_micro
      |FROM fold
      |""".stripMargin)) { (s, dir) =>
    import graft.text.TextAnalysis
    val t = Tables.documents(s, dir)
      .where(col("text").isNotNull)
      .select(col("doc_id"),
        least(size(filter(TextAnalysis.tokens(col("text")),
          w => w === "join")), lit(3)).as("g"),
        size(filter(TextAnalysis.tokens(col("text")),
          w => w === "scan")).as("prox"))
    val top = t.orderBy(col("prox").desc, col("doc_id")).limit(10)
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("prox").desc, col("doc_id"))))
      .materialize()
    val kk = top.agg(count(lit(1)).as("k"))
    top.agg(sort_array(collect_list(struct(col("r"), col("g"))))
        .as("rows"))
      .select(expr(
        """aggregate(transform(rows, x -> x.g),
          |  named_struct('err', CAST(0 AS BIGINT),
          |    'mass', CAST(1000000 AS BIGINT), 'r', CAST(0 AS BIGINT)),
          |  (a, g) -> named_struct(
          |    'err', a.err + (a.mass * (CASE g WHEN 0 THEN 0
          |             WHEN 1 THEN 1 WHEN 2 THEN 3 ELSE 7 END))
          |             div (8 * (a.r + 1)),
          |    'mass', (a.mass * (8 - (CASE g WHEN 0 THEN 0 WHEN 1 THEN 1
          |             WHEN 2 THEN 3 ELSE 7 END))) div 8,
          |    'r', a.r + 1))""".stripMargin).as("st"))
      .crossJoin(broadcast(kk))
      .select(col("k"), col("st.err").as("err_micro"),
        col("st.mass").as("leftover_mass_micro"))
  }

  /** Youden-J optimal threshold for "purchase vs click" from the event
    * value: TPR(t) − FPR(t) maximized over EVERY distinct value
    * threshold — the fact-scaled threshold dim rides one
    * bucket-parallel globalRankCums ECDF pass (suffix counts from the
    * inclusive prefixes), and the argmax is orderBy().limit(1). The
    * operating-point choice behind every alert threshold. */
  def q609: Q = Q(
    "q609_youden_threshold",
    Some("""
      |WITH v AS (
      |  SELECT value,
      |         count(*) FILTER (event_type = 'purchase') AS c1,
      |         count(*) FILTER (event_type = 'click') AS c2
      |  FROM events WHERE event_type IN ('purchase', 'click')
      |  GROUP BY 1),
      |t AS (SELECT sum(c1) AS p, sum(c2) AS neg FROM v),
      |cum AS (
      |  SELECT value, c1, c2,
      |         sum(c1) OVER (ORDER BY value) AS f1,
      |         sum(c2) OVER (ORDER BY value) AS f2
      |  FROM v),
      |j AS (
      |  SELECT value, t.p - f1 + c1 AS tp, t.neg - f2 + c2 AS fp, t.p,
      |         t.neg,
      |         (t.p - f1 + c1) * t.neg - (t.neg - f2 + c2) * t.p AS jn
      |  FROM cum CROSS JOIN t)
      |SELECT CAST(CAST(value * 100 AS BIGINT) AS BIGINT)
      |         AS threshold_cents,
      |       CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
      |       CAST((1000 * tp) // p AS BIGINT) AS tpr_permille,
      |       CAST((1000 * fp) // neg AS BIGINT) AS fpr_permille,
      |       CAST(floor(CAST(jn AS DOUBLE)
      |         / (CAST(p AS DOUBLE) * CAST(neg AS DOUBLE)) * 1000.0)
      |         AS BIGINT) AS j_milli
      |FROM j ORDER BY jn DESC, value LIMIT 1
      |""".stripMargin)) { (s, dir) =>
    val v = Tables.events(s, dir)
      .where(col("event_type").isin("purchase", "click"))
      .groupBy(col("value"))
      .agg(count(when(col("event_type") === "purchase", 1)).as("c1"),
        count(when(col("event_type") === "click", 1)).as("c2"))
      .materialize()
    val t = v.agg(sum(col("c1")).as("p"), sum(col("c2")).as("neg"))
    val cum = graft.dedup.SortedNeighborhood.globalRankCums(
        v.withColumn("__bkt", floor(col("value") / 8).cast("long")),
        idCol = "value", bucketCol = "__bkt", tieCols = Nil,
        cumCols = Seq("c1", "c2"))
      .select(col("value"), col("c1"), col("c2"),
        col("__cum_c1").as("f1"), col("__cum_c2").as("f2"))
    cum.crossJoin(broadcast(t))
      .select(col("value"),
        (col("p") - col("f1") + col("c1")).as("tp"),
        (col("neg") - col("f2") + col("c2")).as("fp"),
        col("p"), col("neg"))
      .withColumn("jn",
        col("tp") * col("neg") - col("fp") * col("p"))
      .orderBy(col("jn").desc, col("value"))
      .limit(1)
      .select(
        (col("value") * 100).cast("decimal(38,0)").cast("long")
          .as("threshold_cents"),
        col("tp"), col("fp"),
        expr("(1000 * tp) div p").as("tpr_permille"),
        expr("(1000 * fp) div neg").as("fpr_permille"),
        expr("CAST(floor(CAST(jn AS DOUBLE)" +
          " / (CAST(p AS DOUBLE) * CAST(neg AS DOUBLE)) * 1000.0)" +
          " AS BIGINT)").as("j_milli"))
  }

  /** Krippendorff's α for two deterministic binary raters of document
    * "substance" (A: n_chars > 300, B: token count > 55): from the
    * coincidence matrix, α = 1 − d(N−1)/(n₀·n₁) with N = 2n codings —
    * chance-corrected agreement that, unlike raw percent agreement,
    * collapses to 0 when a skewed margin explains everything. Exact
    * integers, one pinned division. */
  def q610: Q = Q(
    "q610_krippendorff_alpha",
    Some(s"""
      |WITH d AS (
      |  SELECT CASE WHEN n_chars > 300 THEN 1 ELSE 0 END AS a,
      |         CASE WHEN len(${PipelineQueries.sqlTokens("text")}) > 55
      |              THEN 1 ELSE 0 END AS b
      |  FROM documents WHERE text IS NOT NULL),
      |ag AS (
      |  SELECT count(*) AS n,
      |         count(*) FILTER (a <> b) AS dis,
      |         sum(a) + sum(b) AS n1,
      |         2 * count(*) - sum(a) - sum(b) AS n0
      |  FROM d)
      |SELECT CAST(n AS BIGINT) AS n_docs,
      |       CAST(dis AS BIGINT) AS n_disagree,
      |       CAST((1000 * (n - dis)) // n AS BIGINT) AS p_o_permille,
      |       CAST(floor((1.0 - CAST(dis AS DOUBLE) * (2 * n - 1)
      |         / (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE))) * 1000.0)
      |         AS BIGINT) AS alpha_milli
      |FROM ag
      |""".stripMargin)) { (s, dir) =>
    val d = Tables.documents(s, dir)
      .where(col("text").isNotNull)
      .select(when(col("n_chars") > 300, 1L).otherwise(0L).as("a"),
        when(size(graft.text.TextAnalysis.tokens(col("text"))) > 55, 1L)
          .otherwise(0L).as("b"))
    d.agg(count(lit(1)).as("n"),
        count(when(col("a") =!= col("b"), 1)).as("dis"),
        (sum(col("a")) + sum(col("b"))).as("n1"),
        (lit(2) * count(lit(1)) - sum(col("a")) - sum(col("b")))
          .as("n0"))
      .select(col("n").as("n_docs"), col("dis").as("n_disagree"),
        expr("(1000 * (n - dis)) div n").as("p_o_permille"),
        expr("CAST(floor((1.0 - CAST(dis AS DOUBLE) * (2 * n - 1)" +
          " / (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE))) * 1000.0)" +
          " AS BIGINT)").as("alpha_milli"))
  }
}
