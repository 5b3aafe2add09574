package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ml.Modeling

/** ML operator surface (SURVEY §2.12) driven end-to-end on the derived
  * matchup table, plus an oracle-exact log-loss computation.
  */
object MlQueries {

  val all: Seq[Q] = Seq(q35, q36)

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
