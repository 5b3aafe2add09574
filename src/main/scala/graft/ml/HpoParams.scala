package graft.ml

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.tuning.TrainValidationSplitModel

/** S7 — the HPO best-params hand-off ≙ reference
  * `jobs/11_hpo_backtest.py:48-58` (tune → `hpo_best_params.json`) and
  * `jobs/12_train_ensemble_export.py:58-89` (reload → ensemble fit,
  * falling back to defaults when the file is absent).
  *
  * JSON is hand-rolled on both sides (driver-only metadata, tens of
  * bytes; the build is offline so no JSON library resolves). The writer
  * emits exactly the subset the reader understands: one top-level object,
  * string/number scalars, one level of nested objects, and a string
  * array for `feature_cols`.
  */
object HpoParams {

  final case class ModelReport(params: Map[String, Double], auc: Double, logLoss: Double)

  final case class HpoResult(
      league: String,
      valSeason: Int,
      featureCols: Seq[String],
      logreg: ModelReport,
      gbt: ModelReport)

  /** Numeric hyper-params worth exporting even when NOT grid-swept: the
    * reference's job 11 builds best_params from the FITTED model, so fixed
    * estimator settings (the LR maxIter=60 used during tuning) travel to
    * job 12's refit instead of silently reverting to reload defaults. */
  private val ExportedFixedParams =
    Seq("maxIter", "regParam", "elasticNetParam", "maxDepth",
      "subsamplingRate", "stepSize")

  /** Tuned params of the winning grid point plus the fixed numeric params
    * read off the fitted best model (grid values win on overlap), as
    * name → value. Reads the estimator param maps at the best validation
    * metric instead of casting fitted models, so it works for any
    * estimator in the grid. "Best" honors the evaluator's direction
    * (isLargerBetter), exactly as TrainValidationSplit itself picks
    * bestModel — with a loss metric, maxBy would export the WORST grid
    * point. */
  def bestParams(model: TrainValidationSplitModel): Map[String, Double] = {
    val metrics = model.validationMetrics.zipWithIndex
    val bestIdx =
      if (model.getEvaluator.isLargerBetter) metrics.maxBy(_._1)._2
      else metrics.minBy(_._1)._2
    def numeric(name: String, value: Any): Option[(String, Double)] = value match {
      case d: Double => Some(name -> d)
      case i: Int => Some(name -> i.toDouble)
      case l: Long => Some(name -> l.toDouble)
      case f: Float => Some(name -> f.toDouble)
      case _ => None
    }
    val tuned = model.getEstimatorParamMaps(bestIdx).toSeq.map { pp =>
      numeric(pp.param.name, pp.value).getOrElse(throw new IllegalArgumentException(
        s"non-numeric tuned param ${pp.param.name}: ${pp.value}"))
    }.toMap
    // Fixed params from the fitted winner ≙ reference jobs/11:48-56
    // (best_params dict read off the model, not the grid).
    val fixed = model.bestModel match {
      case pm: org.apache.spark.ml.PipelineModel =>
        pm.stages.toSeq.flatMap { stage =>
          ExportedFixedParams.flatMap { name =>
            stage.params.find(_.name == name).toSeq.flatMap { p =>
              val pa = p.asInstanceOf[org.apache.spark.ml.param.Param[Any]]
              stage.get(pa).orElse(stage.getDefault(pa))
                .flatMap(v => numeric(name, v))
            }
          }
        }.toMap
      case _ => Map.empty[String, Double]
    }
    fixed ++ tuned
  }

  // ---- write ----

  private def jStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def jNum(d: Double): String =
    if (d.isNaN || d.isInfinite) "null" // JSON has no NaN/Infinity tokens
    else if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  private def jReport(r: ModelReport): String = {
    val params = r.params.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jStr(k)}: ${jNum(v)}" }.mkString("{", ", ", "}")
    s"""{"params": $params, "metrics": {"auc": ${jNum(r.auc)}, "logloss": ${jNum(r.logLoss)}}}"""
  }

  def write(result: HpoResult, path: String): Path = {
    val json =
      s"""{
         |  "league": ${jStr(result.league)},
         |  "val_season": ${result.valSeason},
         |  "feature_cols": ${result.featureCols.map(jStr).mkString("[", ", ", "]")},
         |  "logreg": ${jReport(result.logreg)},
         |  "gbt": ${jReport(result.gbt)}
         |}
         |""".stripMargin
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.writeString(p, json)
    p
  }

  // ---- read ----

  /** Minimal recursive-descent JSON reader (objects, arrays, strings,
    * numbers, true/false/null) — enough for the file this object writes
    * and for hand-edited param files. */
  private final class P(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    private def expect(c: Char): Unit = {
      ws()
      if (i >= s.length || s(i) != c)
        throw new IllegalArgumentException(s"expected '$c' at $i in $s")
      i += 1
    }
    def value(): Any = {
      ws()
      s(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => i += 4; true
        case 'f' => i += 5; false
        case 'n' => i += 4; null
        case _ => num()
      }
    }
    private def obj(): Map[String, Any] = {
      expect('{'); ws()
      if (s(i) == '}') { i += 1; return Map.empty }
      val b = Map.newBuilder[String, Any]
      var done = false
      while (!done) {
        ws()
        val k = str()
        expect(':')
        b += (k -> value())
        ws()
        if (s(i) == ',') i += 1 else { expect('}'); done = true }
      }
      b.result()
    }
    private def arr(): Seq[Any] = {
      expect('['); ws()
      if (s(i) == ']') { i += 1; return Seq.empty }
      val b = Seq.newBuilder[Any]
      var done = false
      while (!done) {
        b += value()
        ws()
        if (s(i) == ',') i += 1 else { expect(']'); done = true }
      }
      b.result()
    }
    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s(i) != '"') {
        if (s(i) == '\\') {
          i += 1
          s(i) match {
            case 'n' => sb += '\n'
            case 't' => sb += '\t'
            case 'r' => sb += '\r'
            case 'u' => sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar; i += 4
            case c => sb += c
          }
        } else sb += s(i)
        i += 1
      }
      i += 1
      sb.toString
    }
    private def num(): Double = {
      val start = i
      while (i < s.length && (s(i).isDigit || "+-.eE".contains(s(i)))) i += 1
      s.substring(start, i).toDouble
    }
  }

  def read(path: String): Option[HpoResult] = {
    if (!Files.exists(Paths.get(path))) return None
    val root = new P(Files.readString(Paths.get(path))).value()
      .asInstanceOf[Map[String, Any]]
    def report(key: String): ModelReport = {
      val o = root(key).asInstanceOf[Map[String, Any]]
      val params = o("params").asInstanceOf[Map[String, Any]]
        .map { case (k, v) => k -> v.asInstanceOf[Double] }
      val metrics = o("metrics").asInstanceOf[Map[String, Any]]
      def numOrNaN(v: Any): Double = v match {
        case null => Double.NaN // writer emits null for NaN/Infinity
        case d: Double => d
      }
      ModelReport(params, numOrNaN(metrics("auc")), numOrNaN(metrics("logloss")))
    }
    Some(HpoResult(
      league = root("league").asInstanceOf[String],
      valSeason = root("val_season").asInstanceOf[Double].toInt,
      featureCols = root("feature_cols").asInstanceOf[Seq[Any]].map(_.asInstanceOf[String]),
      logreg = report("logreg"),
      gbt = report("gbt")))
  }

  // ---- reload into pipelines ≙ jobs/12:67-89 (defaults when absent) ----

  def lrFrom(params: Map[String, Double], featureCols: Seq[String]): Pipeline =
    Modeling.lrPipeline(
      featureCols,
      maxIter = params.getOrElse("maxIter", 80.0).toInt,
      regParam = params.getOrElse("regParam", 0.05),
      elasticNet = params.getOrElse("elasticNetParam", 0.0))

  def gbtFrom(params: Map[String, Double], featureCols: Seq[String]): Pipeline =
    Modeling.gbtPipeline(
      featureCols,
      maxIter = params.getOrElse("maxIter", 120.0).toInt,
      maxDepth = params.getOrElse("maxDepth", 5.0).toInt,
      subsamplingRate = params.getOrElse("subsamplingRate", 0.8))
}
