package graft.ml

import org.apache.spark.ml.classification.{GBTClassifier, LogisticRegression}
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.tuning.{ParamGridBuilder, TrainValidationSplit, TrainValidationSplitModel}
import org.apache.spark.sql.DataFrame

/** Hyper-parameter search ≙ reference `src/ml/tuning.py`:
  * TrainValidationSplit (0.8 train ratio, parallelism 2) over small grids,
  * AUC objective.
  */
object Tuning {

  private def tvs(estimator: org.apache.spark.ml.Pipeline, grid: Array[ParamMap]) =
    new TrainValidationSplit()
      .setEstimator(estimator)
      .setEvaluator(new BinaryClassificationEvaluator()
        .setLabelCol("label").setRawPredictionCol("rawPrediction")
        .setMetricName("areaUnderROC"))
      .setEstimatorParamMaps(grid)
      .setTrainRatio(0.8)
      .setParallelism(2)
      .setSeed(42L)

  /** ≙ tuning.py:63-93 (LR grid: regParam × elasticNet). */
  def tuneLr(
      data: DataFrame,
      featureCols: Seq[String],
      regParams: Seq[Double] = Seq(0.01, 0.05),
      elasticNets: Seq[Double] = Seq(0.0, 0.5),
      maxIter: Int = 60): TrainValidationSplitModel = {
    val pipeline = Modeling.lrPipeline(featureCols, maxIter = maxIter)
    val lr = pipeline.getStages(1).asInstanceOf[LogisticRegression]
    val grid = new ParamGridBuilder()
      .addGrid(lr.regParam, regParams)
      .addGrid(lr.elasticNetParam, elasticNets)
      .build()
    tvs(pipeline, grid).fit(data)
  }

  /** ≙ tuning.py:119-150 (GBT grid: maxDepth × maxIter × subsampling). */
  def tuneGbt(
      data: DataFrame,
      featureCols: Seq[String],
      maxDepths: Seq[Int] = Seq(3, 5),
      maxIters: Seq[Int] = Seq(80, 120),
      subsampling: Seq[Double] = Seq(0.7, 0.9)): TrainValidationSplitModel = {
    val pipeline = Modeling.gbtPipeline(featureCols)
    val gbt = pipeline.getStages(1).asInstanceOf[GBTClassifier]
    val grid = new ParamGridBuilder()
      .addGrid(gbt.maxDepth, maxDepths)
      .addGrid(gbt.maxIter, maxIters)
      .addGrid(gbt.subsamplingRate, subsampling)
      .build()
    tvs(pipeline, grid).fit(data)
  }
}
