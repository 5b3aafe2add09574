package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.{GBTClassifier, LogisticRegression}
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MLlib modeling surface. ≙ reference `src/ml/modeling.py`:
  * assembler→classifier pipelines, AUC + LogLoss evaluation, probability
  * extraction, ensemble blending.
  *
  * `handleInvalid="keep"` everywhere — the reference's job 12 omits it and
  * would crash on nulls (SURVEY §7.4 risk 2); we standardize on the fixed
  * behavior.
  */
object Modeling {

  /** Null feature slots → 0.0 before assembly. VectorAssembler's "keep"
    * turns null into NaN, which MLlib estimators reject — the "0-filled
    * vector slot" behavior the reference relies on needs this explicit
    * imputation step. Call on both training and scoring frames. */
  def fillMissing(df: DataFrame, featureCols: Seq[String]): DataFrame =
    df.na.fill(0.0, featureCols)

  /** ≙ modeling.py:34-49 canonical feature list, adapted to whatever
    * matchup columns the caller attaches. */
  def assembler(featureCols: Seq[String]): VectorAssembler =
    new VectorAssembler()
      .setInputCols(featureCols.toArray)
      .setOutputCol("features")
      .setHandleInvalid("keep")

  /** ≙ modeling.py:73-82 (LR baseline config). */
  def lrPipeline(
      featureCols: Seq[String],
      maxIter: Int = 50,
      regParam: Double = 0.05,
      elasticNet: Double = 0.0): Pipeline = {
    val lr = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam).setElasticNetParam(elasticNet)
      .setLabelCol("label").setFeaturesCol("features")
    new Pipeline().setStages(Array(assembler(featureCols), lr))
  }

  /** ≙ tuning.py:119-133 / job 12 (GBT config). */
  def gbtPipeline(
      featureCols: Seq[String],
      maxIter: Int = 120,
      maxDepth: Int = 5,
      subsamplingRate: Double = 1.0,
      seed: Long = 42L): Pipeline = {
    val gbt = new GBTClassifier()
      .setMaxIter(maxIter).setMaxDepth(maxDepth)
      .setSubsamplingRate(subsamplingRate).setSeed(seed)
      .setLabelCol("label").setFeaturesCol("features")
    new Pipeline().setStages(Array(assembler(featureCols), gbt))
  }

  /** P(label=1) from the MLlib probability vector (P7: Scala needs
    * vector_to_array, getItem does not index ml Vectors). */
  def probOf(probabilityCol: Column = col("probability")): Column =
    vector_to_array(probabilityCol).getItem(1)

  /** ε-clipped probability (F5) ≙ modeling.py:86,126. */
  def clip(p: Column, eps: Double = 1e-15): Column =
    least(greatest(p, lit(eps)), lit(1.0 - eps))

  /** Row-wise log-loss term (ML7) ≙ modeling.py:129-130. */
  def logLossTerm(label: Column, p: Column): Column = {
    val pc = clip(p)
    -(label.cast("double") * log(pc) + (lit(1.0) - label.cast("double")) * log(lit(1.0) - pc))
  }

  /** (areaUnderROC, logLoss) of a fitted model on `data`
    * ≙ modeling.py:89-137. */
  def evaluate(model: PipelineModel, data: DataFrame): (Double, Double) = {
    val scored = model.transform(data)
    val auc = new BinaryClassificationEvaluator()
      .setLabelCol("label").setRawPredictionCol("rawPrediction")
      .setMetricName("areaUnderROC")
      .evaluate(scored)
    val ll = scored
      .select(logLossTerm(col("label"), probOf()).as("ll"))
      .agg(avg(col("ll"))).head().getDouble(0)
    (auc, ll)
  }

  /** Pinned-coefficient linear score — the SERVING half of the LR path
    * (≙ reference `src/ml/modeling.py:122-137` score step) as exact
    * column arithmetic over the assembled feature vector: a strict
    * left-fold Σ xᵢ·wᵢ + b, so the floating-point op order is pinned
    * and an oracle stating the same left-to-right expression computes
    * the bit-identical double. Deterministic by construction — this is
    * what makes the scoring path hash-gatable while the FIT stays
    * rows-only (q35). */
  def linearScore(featuresCol: Column, weights: Seq[Double], bias: Double): Column =
    weights.zipWithIndex.map { case (w, i) =>
      vector_to_array(featuresCol).getItem(i) * lit(w)
    }.reduce(_ + _) + lit(bias)

  /** Logistic link for [[linearScore]] ≙ modeling.py sigmoid. */
  def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** Ensemble blend (ML8) ≙ job 12:145-153: inner-join two scored frames
    * on `idCols`, Pred = α·gbt + (1−α)·lr. */
  def blend(
      lrScores: DataFrame,
      gbtScores: DataFrame,
      idCols: Seq[String],
      alpha: Double = 0.65): DataFrame = {
    val lr = lrScores.withColumnRenamed("Pred", "pred_lr")
    val gbt = gbtScores.withColumnRenamed("Pred", "pred_gbt")
    lr.join(gbt, idCols, "inner")
      .withColumn("Pred",
        lit(alpha) * col("pred_gbt") + lit(1.0 - alpha) * col("pred_lr"))
  }
}
