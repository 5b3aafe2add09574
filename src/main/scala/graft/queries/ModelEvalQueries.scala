package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Materialize.MatOps
import graft.Tables
import PipelineQueries.sqlSaltedHash

/** Round-7 model-evaluation wave over ONE shared predictor: per-
  * discount-level return rates learned on shipments through 1997
  * (permille integers — q460's calibrated-by-history model) scoring
  * the 1998+ half. Five evaluation lenses a model gate needs:
  * threshold sweep (F1/MCC), score-distribution KS separation,
  * permutation-importance AUC, Hosmer–Lemeshow calibration χ², and
  * expected calibration error. Everything is exact integer arithmetic
  * on (level, n, positives) tables — the eval half never re-reads
  * floats. */
object ModelEvalQueries {

  val all: Seq[Q] = Seq(q516, q517, q518, q519, q520)

  /** Shared oracle CTEs: tr = train rates (permille) per discount
    * level, ev = eval rows per level with outcome counts. */
  private def sqlBase: String =
    """l AS (
      |  SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS b,
      |         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
      |         year(l_shipdate) AS yr,
      |         l_orderkey * 8 + l_linenumber AS lid
      |  FROM lineitem),
      |tr AS (SELECT b, (1000 * sum(y)) // count(*) AS p
      |       FROM l WHERE yr <= 1997 GROUP BY 1),
      |ev AS (
      |  SELECT l.b, tr.p, l.y, l.lid
      |  FROM l JOIN tr ON l.b = tr.b WHERE l.yr >= 1998)""".stripMargin

  /** Shared Spark side: eval rows (b, p, y, lid). */
  private def evalRows(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .select(expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)").as("b"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"),
        year(col("l_shipdate")).as("yr"),
        expr("l_orderkey * 8 + l_linenumber").as("lid"))
      .materialize()
    val tr = l.where(col("yr") <= 1997).groupBy(col("b"))
      .agg(expr("(1000 * sum(y)) div count(1)").as("p"))
    l.where(col("yr") >= 1998)
      .join(broadcast(tr.withColumnRenamed("b", "tb")),
        col("b") === col("tb"))
      .select(col("b"), col("p"), col("y"), col("lid"))
  }

  /** Classification threshold sweep: predict "returned" when the
    * level's learned rate clears t ∈ {325..345‰}, and report
    * precision/recall/F1/MCC at each — the operating-point table a
    * deployment picks from. Confusion counts are exact; MCC is the one
    * pinned double (its four factors overflow integers). */
  def q516: Q = {
    val thresholds = Seq(325, 330, 335, 340, 345)
    val mcc = "(CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)" +
      " - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))" +
      " / sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)" +
      " * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE))"
    Q("q516_threshold_sweep_f1_mcc",
      Some(s"""
        |WITH $sqlBase,
        |th(t) AS (VALUES ${thresholds.map(t => s"($t)").mkString(", ")}),
        |cf AS (
        |  SELECT th.t,
        |         sum(CASE WHEN p >= th.t AND y = 1 THEN 1 ELSE 0 END) AS tp,
        |         sum(CASE WHEN p >= th.t AND y = 0 THEN 1 ELSE 0 END) AS fp,
        |         sum(CASE WHEN p < th.t AND y = 1 THEN 1 ELSE 0 END) AS fn,
        |         sum(CASE WHEN p < th.t AND y = 0 THEN 1 ELSE 0 END) AS tn
        |  FROM ev CROSS JOIN th GROUP BY 1)
        |SELECT CAST(t AS BIGINT) AS threshold_permille,
        |       CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
        |       CAST(CASE WHEN tp + fp = 0 THEN 0
        |            ELSE (1000 * tp) // (tp + fp) END AS BIGINT)
        |         AS precision_milli,
        |       CAST(CASE WHEN tp + fn = 0 THEN 0
        |            ELSE (1000 * tp) // (tp + fn) END AS BIGINT)
        |         AS recall_milli,
        |       CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN 0
        |            ELSE (2000 * tp) // (2 * tp + fp + fn) END AS BIGINT)
        |         AS f1_milli,
        |       CAST(CASE WHEN tp + fp = 0 OR tp + fn = 0
        |                 OR tn + fp = 0 OR tn + fn = 0 THEN 0
        |            ELSE CAST(floor(CAST($mcc AS DECIMAL(28,6)) * 1000)
        |                 AS BIGINT) END AS BIGINT) AS mcc_milli
        |FROM cf ORDER BY threshold_permille
        |""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val ev = evalRows(s, dir)
      val th = thresholds.toDF("t")
      val cf = ev.crossJoin(broadcast(th))
        .groupBy(col("t"))
        .agg(
          sum(when(col("p") >= col("t") && col("y") === 1, 1L)
            .otherwise(0L)).as("tp"),
          sum(when(col("p") >= col("t") && col("y") === 0, 1L)
            .otherwise(0L)).as("fp"),
          sum(when(col("p") < col("t") && col("y") === 1, 1L)
            .otherwise(0L)).as("fn"),
          sum(when(col("p") < col("t") && col("y") === 0, 1L)
            .otherwise(0L)).as("tn"))
      cf.select(col("t").cast("long").as("threshold_permille"),
          col("tp"), col("fp"),
          expr("CASE WHEN tp + fp = 0 THEN 0" +
            " ELSE (1000 * tp) div (tp + fp) END").as("precision_milli"),
          expr("CASE WHEN tp + fn = 0 THEN 0" +
            " ELSE (1000 * tp) div (tp + fn) END").as("recall_milli"),
          expr("CASE WHEN 2 * tp + fp + fn = 0 THEN 0" +
            " ELSE (2000 * tp) div (2 * tp + fp + fn) END").as("f1_milli"),
          expr(s"CASE WHEN tp + fp = 0 OR tp + fn = 0 OR tn + fp = 0" +
            s" OR tn + fn = 0 THEN CAST(0 AS BIGINT)" +
            s" ELSE CAST(floor(CAST($mcc AS DECIMAL(28,6)) * 1000)" +
            s" AS BIGINT) END").as("mcc_milli"))
        .orderBy(col("threshold_permille"))
    }
  }

  /** KS separation of the score distributions of returned vs kept
    * lines — the credit-scoring discrimination statistic: max gap
    * between the two score CDFs, exact via common-denominator integer
    * arithmetic over the 11 score support points. */
  def q517: Q = Q(
    "q517_score_ks_separation",
    Some(s"""
      |WITH $sqlBase,
      |lv AS (
      |  SELECT p, sum(y) AS pos, sum(1 - y) AS neg
      |  FROM ev GROUP BY 1),
      |tot AS (SELECT sum(pos) AS np, sum(neg) AS nn FROM lv),
      |cum AS (
      |  SELECT p, sum(pos) OVER (ORDER BY p) AS cp,
      |         sum(neg) OVER (ORDER BY p) AS cn
      |  FROM lv),
      |ks AS (
      |  SELECT max(abs(CAST(cum.cp AS HUGEINT) * tot.nn
      |                 - CAST(cum.cn AS HUGEINT) * tot.np)) AS m
      |  FROM cum CROSS JOIN tot)
      |SELECT (SELECT CAST(np AS BIGINT) FROM tot) AS n_pos,
      |       (SELECT CAST(nn AS BIGINT) FROM tot) AS n_neg,
      |       CAST((1000 * ks.m) // ((SELECT np FROM tot)
      |            * (SELECT CAST(nn AS HUGEINT) FROM tot)) AS BIGINT)
      |         AS ks_milli
      |FROM ks
      |""".stripMargin)) { (s, dir) =>
    val ev = evalRows(s, dir)
    val lv = ev.groupBy(col("p"))
      .agg(sum(col("y")).as("pos"), sum(lit(1L) - col("y")).as("neg"))
      .materialize() // 11-level dim
    val tot = lv.agg(sum(col("pos")).as("np"), sum(col("neg")).as("nn"))
    val w = Window.orderBy(col("p")) // level dim
    val cum = lv.withColumn("cp", sum(col("pos")).over(w))
      .withColumn("cn", sum(col("neg")).over(w))
    cum.crossJoin(broadcast(tot))
      .agg(max(abs(col("cp").cast("decimal(38,0)") * col("nn")
        - col("cn").cast("decimal(38,0)") * col("np"))).as("m"),
        max(col("np")).as("np"), max(col("nn")).as("nn"))
      .select(col("np").as("n_pos"), col("nn").as("n_neg"),
        expr("CAST((1000 * m) div (np * CAST(nn AS DECIMAL(38,0)))" +
          " AS BIGINT)").as("ks_milli"))
  }

  /** Permutation importance via AUC: the model's rank-AUC (grouped
    * Mann–Whitney with exact midrank handling) against the same
    * pipeline scored by a salted-hash-randomized discount level — the
    * "does the feature actually carry signal" control every importance
    * claim needs. AUC = Σ pos_b(2·cumNeg_< + neg_b) / (2·Np·Nn), exact
    * integers both for the real and the randomized scorer. */
  def q518: Q = {
    def aucCtes(src: String, pfx: String) =
      s"""${pfx}lv AS (
         |  SELECT p, sum(y) AS pos, sum(1 - y) AS neg
         |  FROM $src GROUP BY 1),
         |${pfx}cum AS (
         |  SELECT p, pos, neg,
         |         sum(neg) OVER (ORDER BY p) - neg AS cnb
         |  FROM ${pfx}lv),
         |${pfx}auc AS (
         |  SELECT sum(CAST(pos AS HUGEINT) * (2 * cnb + neg)) AS u,
         |         sum(pos) AS np, sum(neg) AS nn
         |  FROM ${pfx}cum)""".stripMargin
    Q("q518_permutation_importance_auc",
      Some(s"""
        |WITH $sqlBase,
        |rnd AS (
        |  SELECT tr.p, ev.y FROM ev
        |  JOIN tr ON tr.b = (${sqlSaltedHash(
             "CAST(ev.lid AS VARCHAR)", "permimp")}) % 11),
        |${aucCtes("ev", "m")},
        |${aucCtes("rnd", "r")}
        |SELECT CAST(mauc.np AS BIGINT) AS n_pos,
        |       CAST((1000 * mauc.u) // (2 * CAST(mauc.np AS HUGEINT)
        |            * mauc.nn) AS BIGINT) AS auc_model_milli,
        |       CAST((1000 * rauc.u) // (2 * CAST(rauc.np AS HUGEINT)
        |            * rauc.nn) AS BIGINT) AS auc_random_milli
        |FROM mauc CROSS JOIN rauc
        |""".stripMargin)) { (s, dir) =>
      val ev = evalRows(s, dir).materialize()
      val tr = ev.select(col("b"), col("p")).distinct()
      val rnd = ev
        .select(col("y"),
          (graft.functions.PolyHash.saltedHash(
            col("lid").cast("string"), "permimp") % 11).as("rb"))
        .join(broadcast(tr.withColumnRenamed("b", "tb")
          .withColumnRenamed("p", "rp")), col("rb") === col("tb"))
        .select(col("rp").as("p"), col("y"))
      def auc(df: DataFrame) = {
        val lv = df.groupBy(col("p"))
          .agg(sum(col("y")).as("pos"), sum(lit(1L) - col("y")).as("neg"))
        val w = Window.orderBy(col("p"))
        lv.withColumn("cnb", sum(col("neg")).over(w) - col("neg"))
          .agg(sum(col("pos").cast("decimal(38,0)")
            * (lit(2) * col("cnb") + col("neg"))).as("u"),
            sum(col("pos")).as("np"), sum(col("neg")).as("nn"))
      }
      val m = auc(ev.select(col("p"), col("y")))
        .select(col("np"), col("nn"),
          expr("CAST((1000 * u) div (2 * CAST(np AS DECIMAL(38,0)) * nn)" +
            " AS BIGINT)").as("auc_model_milli"))
      val r = auc(rnd)
        .select(expr("CAST((1000 * u) div (2 * CAST(np AS DECIMAL(38,0))" +
          " * nn) AS BIGINT)").as("auc_random_milli"))
      m.crossJoin(broadcast(r))
        .select(col("np").as("n_pos"), col("auc_model_milli"),
          col("auc_random_milli"))
    }
  }

  /** Hosmer–Lemeshow calibration χ² over the 11 natural score groups:
    * Σ (O − E)²/(E(1−p)) with the learned permille rates as E — the
    * classical goodness-of-calibration test (high χ² = the learned
    * rates no longer fit the eval period). Exact integers with the
    * micro-scaled closed form. */
  def q519: Q = Q(
    "q519_hosmer_lemeshow",
    Some(s"""
      |WITH $sqlBase,
      |g AS (
      |  SELECT b, max(p) AS p, count(*) AS n, sum(y) AS o
      |  FROM ev GROUP BY 1),
      |hl AS (
      |  SELECT count(*) AS n_groups,
      |         sum((1000 * (1000 * o - n * p)) * (1000 * o - n * p)
      |             // (n * p * (1000 - p))) AS chi2m
      |  FROM g WHERE p > 0 AND p < 1000)
      |SELECT CAST(n_groups AS BIGINT) AS n_groups,
      |       CAST(chi2m AS BIGINT) AS chi2_milli
      |FROM hl
      |""".stripMargin)) { (s, dir) =>
    val ev = evalRows(s, dir)
    val g = ev.groupBy(col("b"))
      .agg(max(col("p")).as("p"), count(lit(1)).as("n"),
        sum(col("y")).as("o"))
      .where(col("p") > 0 && col("p") < 1000)
    g.agg(count(lit(1)).as("n_groups"),
        sum(expr("(1000 * (1000 * o - n * p)) * (1000 * o - n * p)" +
          " div (n * p * (1000 - p))")).as("chi2_milli"))
      .select(col("n_groups"), col("chi2_milli"))
  }

  /** Expected (and max) calibration error over the score groups:
    * ECE = Σ (n_b/N)·|observed − predicted| — the modern calibration
    * headline number — plus MCE, both exact integer arithmetic in
    * micro/milli units. */
  def q520: Q = Q(
    "q520_expected_calibration_error",
    Some(s"""
      |WITH $sqlBase,
      |g AS (
      |  SELECT b, max(p) AS p, count(*) AS n, sum(y) AS o
      |  FROM ev GROUP BY 1),
      |tot AS (SELECT sum(n) AS nn FROM g),
      |e AS (
      |  SELECT sum(abs(1000 * o - n * p)) AS sgap,
      |         max((1000 * abs(1000 * o - n * p)) // (1000 * n)) AS mce
      |  FROM g)
      |SELECT (SELECT CAST(nn AS BIGINT) FROM tot) AS n_eval,
      |       CAST((1000000 * e.sgap) // (1000 * (SELECT nn FROM tot))
      |            AS BIGINT) AS ece_micro,
      |       CAST(e.mce AS BIGINT) AS mce_milli
      |FROM e
      |""".stripMargin)) { (s, dir) =>
    val ev = evalRows(s, dir)
    val g = ev.groupBy(col("b"))
      .agg(max(col("p")).as("p"), count(lit(1)).as("n"),
        sum(col("y")).as("o"))
      .materialize()
    val tot = g.agg(sum(col("n")).as("nn"))
    g.agg(sum(abs(lit(1000) * col("o") - col("n") * col("p")))
        .as("sgap"),
        max(expr("(1000 * abs(1000 * o - n * p)) div (1000 * n)"))
          .as("mce"))
      .crossJoin(broadcast(tot))
      .select(col("nn").as("n_eval"),
        expr("(1000000 * sgap) div (1000 * nn)").as("ece_micro"),
        col("mce").as("mce_milli"))
  }
}
