package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ml.Modeling

/** ML operator surface (SURVEY §2.12) driven end-to-end on the derived
  * matchup table, plus an oracle-exact log-loss computation.
  */
object MlQueries {

  val all: Seq[Q] = Seq(q35, q36, q274, q275)

  /** Shared oracle prefix for the PINNED-coefficient serving path
    * (q274/q275): the q22 matchup-feature CTEs, then score with two
    * hand-fixed weight vectors in the exact left-to-right op order
    * [[graft.ml.Modeling.linearScore]] uses, sigmoid link, α=0.65
    * blend written as `0.65·pb + (1.0 − 0.65)·pa` (NOT a 0.35 literal —
    * 1.0−0.65 is a different double than 0.35, and the Scala side
    * computes the subtraction), ε-clip, row log-loss. Training stays
    * rows-only (q35); SCORING is deterministic double arithmetic, so
    * the reference's serving path (modeling.py:122-137, job
    * 12:145-153) is hash-gated here. */
  private def pinnedSql: String = DomainQueries.GamesSql + """
    |, matchups AS (
    |  SELECT Season, GameId, WTeamID AS Team1, LTeamID AS Team2,
    |         1 AS label
    |  FROM games
    |  UNION ALL
    |  SELECT Season, GameId, LTeamID, WTeamID, 0 FROM games),
    |f AS (
    |  SELECT m.Season, m.GameId, m.Team1, m.Team2, m.label,
    |         s1.WinRate - s2.WinRate AS x1,
    |         s1.AvgPointDiff - s2.AvgPointDiff AS x2,
    |         s1.WinRate AS x3, s2.WinRate AS x4
    |  FROM matchups m
    |  LEFT JOIN stats s1 ON m.Season = s1.Season AND m.Team1 = s1.TeamID
    |  LEFT JOIN stats s2 ON m.Season = s2.Season AND m.Team2 = s2.TeamID
    |  WHERE s1.WinRate - s2.WinRate IS NOT NULL
    |    AND s1.AvgPointDiff - s2.AvgPointDiff IS NOT NULL),
    |z AS (
    |  SELECT Season, GameId, Team1, Team2, label,
    |         x1 * 2.5 + x2 * 0.25 + x3 * 0.5 + x4 * (-0.5) + (-0.25) AS za,
    |         x1 * 1.25 + x2 * 0.125 + x3 * 0.75 + x4 * (-0.75) + 0.125 AS zb
    |  FROM f),
    |p AS (
    |  SELECT *, 1.0 / (1.0 + exp(-za)) AS pa, 1.0 / (1.0 + exp(-zb)) AS pb
    |  FROM z),
    |bl AS (SELECT *, 0.65 * pb + (1.0 - 0.65) * pa AS pblend FROM p),
    |sc AS (
    |  SELECT *, least(greatest(pblend, 1e-15), 1.0 - 1e-15) AS pc FROM bl),
    |ll AS (
    |  SELECT *, -(CAST(label AS DOUBLE) * ln(pc)
    |             + (1.0 - CAST(label AS DOUBLE)) * ln(1.0 - pc)) AS ll
    |  FROM sc)
    |""".stripMargin

  private val PinnedFeatureCols =
    Seq("WinRateDiff", "AvgPointDiffDiff", "T1_WinRate", "T2_WinRate")
  private val WeightsA = Seq(2.5, 0.25, 0.5, -0.5)
  private val BiasA = -0.25
  private val WeightsB = Seq(1.25, 0.125, 0.75, -0.75)
  private val BiasB = 0.125

  /** The assembled + twice-scored matchup frame shared by q274/q275:
    * VectorAssembler (handleInvalid=keep) → pinned linear scores za/zb
    * → sigmoid → α-blend via [[Modeling.blend]]'s exact op order. */
  private def pinnedScored(
      s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    import graft.Materialize.MatOps
    import graft.marchmania.{Matchups, TeamSeasonStats}
    val g = DomainQueries.games(s, dir)
    val stats = TeamSeasonStats.build(g)
      .select(col("Season"), col("TeamID"), col("WinRate"), col("AvgPointDiff"))
      .materialize() // small dim read by both broadcast attach sides
    val feats = Matchups.dropIncomplete(
      Matchups.attachFeatures(
        Matchups.buildLabeled(g), stats,
        diffCols = Seq("WinRate", "AvgPointDiff")),
      Seq("WinRateDiff", "AvgPointDiffDiff"))
    Modeling.assembler(PinnedFeatureCols)
      .transform(Modeling.fillMissing(feats, PinnedFeatureCols))
      .withColumn("za",
        Modeling.linearScore(col("features"), WeightsA, BiasA))
      .withColumn("zb",
        Modeling.linearScore(col("features"), WeightsB, BiasB))
      .withColumn("pa", Modeling.sigmoid(col("za")))
      .withColumn("pb", Modeling.sigmoid(col("zb")))
      // Modeling.blend's exact arithmetic (α·gbt + (1−α)·lr) without
      // re-joining the frame against itself — same doubles, one scan
      .withColumn("pblend",
        lit(0.65) * col("pb") + lit(1.0 - 0.65) * col("pa"))
      .withColumn("ll", Modeling.logLossTerm(col("label"), col("pblend")))
  }

  /** Pinned-coefficient serving path, per-matchup (assembler → σ →
    * blend → clip → log-loss), every emitted probability floor-
    * quantized to ppm and the row loss to micro-nats (the q235
    * transcendental-quantization idiom) — the hash-gated face of the
    * reference's score-and-export job. */
  def q274: Q = Q(
    "q274_pinned_lr_scoring",
    Some(pinnedSql + """
      |SELECT Season, GameId, Team1, Team2, label,
      |       CAST(floor(CAST(pa AS DECIMAL(18,9)) * 1000000) AS BIGINT)
      |         AS pa_ppm,
      |       CAST(floor(CAST(pb AS DECIMAL(18,9)) * 1000000) AS BIGINT)
      |         AS pb_ppm,
      |       CAST(floor(CAST(pblend AS DECIMAL(18,9)) * 1000000) AS BIGINT)
      |         AS blend_ppm,
      |       CAST(floor(CAST(ll AS DECIMAL(18,9)) * 1000000) AS BIGINT)
      |         AS ll_micro
      |FROM ll ORDER BY Season, GameId, label
      |""".stripMargin)) { (s, dir) =>
    def q6(c: String) =
      floor(col(c).cast("decimal(18,9)") * 1000000).cast("long")
    pinnedScored(s, dir).select(
      col("Season"), col("GameId"), col("Team1"), col("Team2"), col("label"),
      q6("pa").as("pa_ppm"), q6("pb").as("pb_ppm"),
      q6("pblend").as("blend_ppm"), q6("ll").as("ll_micro"))
      .orderBy(col("Season"), col("GameId"), col("label"))
  }

  /** Per-season evaluation of the pinned models: exact micro-nat
    * log-loss SUM (each row floor-quantized first, then integer-summed
    * — order-independent by construction) and per-model accuracy via
    * the SIGN of the linear score (polynomial arithmetic, so the
    * decision boundary is bit-identical cross-engine; no transcendental
    * near a threshold). */
  def q275: Q = Q(
    "q275_pinned_model_eval",
    Some(pinnedSql + """
      |SELECT Season,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(floor(CAST(ll AS DECIMAL(18,9)) * 1000000)
      |                     AS BIGINT)) AS BIGINT) AS sum_ll_micro,
      |       CAST(sum(CASE WHEN (za >= 0) = (label = 1) THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_correct_a,
      |       CAST(sum(CASE WHEN (zb >= 0) = (label = 1) THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_correct_b
      |FROM ll GROUP BY Season ORDER BY Season
      |""".stripMargin)) { (s, dir) =>
    pinnedScored(s, dir)
      .groupBy(col("Season"))
      .agg(
        count(lit(1)).as("n"),
        sum(floor(col("ll").cast("decimal(18,9)") * 1000000).cast("long"))
          .as("sum_ll_micro"),
        sum(when((col("za") >= 0) === (col("label") === 1), 1L)
          .otherwise(0L)).as("n_correct_a"),
        sum(when((col("zb") >= 0) === (col("label") === 1), 1L)
          .otherwise(0L)).as("n_correct_b"))
      .orderBy(col("Season"))
  }

  /** ML1-ML8 end-to-end: LR + GBT pipelines (VectorAssembler
    * handleInvalid=keep) trained on earlier seasons of the derived matchup
    * features, scored on the latest season, α-blended. Rows-only driver
    * check (MLlib fits are only reproducible up to fp reduction order —
    * SURVEY §7.4 risk 5); metric-level assertions live in MlSpec.
    */
  def q35: Q = Q(
    "q35_train_score_blend",
    None) { (s, dir) =>
    import graft.marchmania.{Matchups, TeamSeasonStats}
    val g = DomainQueries.games(s, dir)
    val stats = TeamSeasonStats.build(g)
      .select(col("Season"), col("TeamID"), col("WinRate"), col("AvgPointDiff"))
    // same features as q22 but WITHOUT the presentation sort: training
    // doesn't need order, and skipping it saves a full-range shuffle
    val feats = Matchups.dropIncomplete(
      Matchups.attachFeatures(
        Matchups.buildLabeled(g), stats, diffCols = Seq("WinRate", "AvgPointDiff")),
      Seq("WinRateDiff", "AvgPointDiffDiff")).cache()
    val maxSeason = feats.agg(max(col("Season"))).head().getInt(0)
    val train = feats.filter(col("Season") < maxSeason)
    val test = feats.filter(col("Season") === maxSeason)
    val featureCols = Seq("WinRateDiff", "AvgPointDiffDiff", "T1_WinRate", "T2_WinRate")
    // the two fits are independent jobs over the same cached input —
    // run them concurrently (Spark schedules jobs from separate driver
    // threads onto the shared executor pool)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    // iteration counts: smallest that keep MlAndStreamingSpec's AUC gate
    // (LR converges in <10 iters on 4 features; GBT depth-3 × 5 trees)
    val lrF = Future(Modeling.lrPipeline(featureCols, maxIter = 10).fit(train))
    val gbtF = Future(Modeling.gbtPipeline(featureCols, maxIter = 5, maxDepth = 3).fit(train))
    val lrModel = Await.result(lrF, Duration.Inf)
    val gbtModel = Await.result(gbtF, Duration.Inf)
    def score(m: org.apache.spark.ml.PipelineModel) =
      m.transform(test).select(
        col("Season"), col("GameId"), col("Team1"), col("Team2"), col("label"),
        Modeling.probOf().as("Pred"))
    val blended = Modeling.blend(
      score(lrModel), score(gbtModel),
      idCols = Seq("Season", "GameId", "Team1", "Team2", "label"), alpha = 0.65)
    feats.unpersist()
    blended.orderBy(col("GameId"), col("label"))
  }

  /** ML7 (log-loss column expression with ε-clip) on a deterministic
    * synthetic probability — exact per-row doubles, then an exact
    * decimal-quantized mean so the aggregate is order-independent.
    */
  def q36: Q = Q(
    "q36_logloss",
    Some("""
      |WITH scored AS (
      |  SELECT o_orderstatus,
      |         CAST(o_orderkey % 2 AS DOUBLE) AS y,
      |         ((o_orderkey % 997) + 0.5) / 998.0 AS p
      |  FROM orders),
      |t AS (
      |  SELECT o_orderstatus,
      |         -(y * ln(least(greatest(p, 1e-15), 1.0 - 1e-15))
      |           + (1.0 - y) * ln(1.0 - least(greatest(p, 1e-15), 1.0 - 1e-15))) AS ll
      |  FROM scored)
      |SELECT o_orderstatus,
      |       count(*) AS n,
      |       CAST(sum(CAST(ll AS DECIMAL(18,9))) AS DOUBLE) / count(*) AS mean_logloss
      |FROM t GROUP BY o_orderstatus ORDER BY o_orderstatus
      |""".stripMargin)) { (s, dir) =>
    import org.apache.spark.sql.types.DecimalType
    val scored = Tables.orders(s, dir).select(
      col("o_orderstatus"),
      (col("o_orderkey") % 2).cast("double").as("y"),
      ((col("o_orderkey") % 997) + 0.5).cast("double")./(lit(998.0)).as("p"))
    scored
      .select(col("o_orderstatus"), Modeling.logLossTerm(col("y"), col("p")).as("ll"))
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        (sum(col("ll").cast(DecimalType(18, 9))).cast("double") / count(lit(1)))
          .as("mean_logloss"))
      .orderBy(col("o_orderstatus"))
  }
}
