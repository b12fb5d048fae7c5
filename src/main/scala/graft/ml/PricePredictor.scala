package graft.ml

import graft.functions.Indicators
import graft.operators.DailySeries
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.ml.regression.{LinearRegression, LinearRegressionModel}
import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** F4/F5 — next-day price prediction: StandardScaler + LinearRegression
  * with a residual-correction second model, then a next-day merge row.
  *
  * Reference: analyze_news_stock_patterns.py:76-147 (scale at 121-123,
  * primary fit 126-127, MAE/RMSE 129-133, residual model 135-138) and
  * :150-238 (predict, sum of primary+correction at 212-214, date+1 at
  * 217, upsert U5 at 225-230).
  *
  * Features mirror the reference's: previous close, per-symbol percent
  * change, rolling volatility proxy — all window-derived, partitioned
  * by user (no global sorts). Training data collects to the driver only
  * inside spark.ml's L-BFGS (standard for linear models); scoring is a
  * distributed `transform`.
  */
object PricePredictor {

  case class Metrics(mae: Double, rmse: Double)

  /** Window-feature frame: label = next-day close (W6). */
  def features(spark: SparkSession, dir: String): DataFrame =
    featuresOf(DailySeries(spark, dir))

  /** [[features]] over an ALREADY-DERIVED daily-bar frame (user_id, d,
    * close, high, low) — what a standing history table or a streaming
    * fold trains from ([[graft.streaming.StreamingModel]]) instead of
    * re-aggregating the raw source. */
  def featuresOf(daily: DataFrame): DataFrame = {
    val w = Indicators.series("user_id", "d")
    daily
      .withColumn("prev_close", Indicators.prev(col("close"), w))
      .withColumn("pct_change", Indicators.pctChange(col("close"), w))
      .withColumn("vol",
        when(col("low") =!= 0, (col("high") - col("low")) / col("low") * 100)
          .otherwise(lit(0.0)))
      .withColumn("label", lead(col("close"), 1).over(w))
      .na.drop(Seq("prev_close", "pct_change", "label"))
  }

  /** The numeric feature recipe — the ONE definition both the model's
    * assembler and the artifact's drift monitor consume (r19 verdict
    * #1: a hand-duplicated monitor list meant a future feature column
    * could be fitted on yet silently un-monitored — the drift loop
    * would degrade with no loud failure). Extending the recipe HERE
    * extends both the fit and the monitor; there is no second list to
    * forget. */
  val FeatureCols: Seq[String] = Seq("close", "prev_close", "pct_change", "vol")

  /** Every column the model artifact's PSI tick monitors: the feature
    * recipe plus the label — label drift is exactly the regime change
    * a served regression must not ride through. */
  val MonitoredCols: Seq[String] = FeatureCols :+ "label"

  private def assembler = new VectorAssembler()
    .setInputCols(FeatureCols.toArray)
    .setOutputCol("raw_features")

  /** Primary pipeline: assemble → standardize → linear regression. */
  def fitPrimary(train: DataFrame): PipelineModel = {
    val scaler = new StandardScaler()
      .setInputCol("raw_features").setOutputCol("features")
      .setWithMean(true).setWithStd(true)
    val lr = new LinearRegression()
      .setFeaturesCol("features").setLabelCol("label")
      .setPredictionCol("prediction")
    new Pipeline().setStages(Array(assembler, scaler, lr)).fit(train)
  }

  /** Residual model: a second LinearRegression on (label − prediction),
    * mirroring analyze_news_stock_patterns.py:135-138. */
  def fitResidual(primary: PipelineModel, train: DataFrame): PipelineModel = {
    val withResidual = primary.transform(train)
      .withColumn("residual", col("label") - col("prediction"))
    val scaler = new StandardScaler()
      .setInputCol("raw_features").setOutputCol("res_features")
      .setWithMean(true).setWithStd(true)
    val lr = new LinearRegression()
      .setFeaturesCol("res_features").setLabelCol("residual")
      .setPredictionCol("residual_pred")
    new Pipeline().setStages(Array(scaler, lr))
      .fit(withResidual.drop("features"))
  }

  /** MAE/RMSE as logged by the reference (analyze...py:129-133). */
  def evaluate(model: PipelineModel, df: DataFrame): Metrics = {
    val scored = model.transform(df)
    val mae = new RegressionEvaluator().setLabelCol("label")
      .setPredictionCol("prediction").setMetricName("mae").evaluate(scored)
    val rmse = new RegressionEvaluator().setLabelCol("label")
      .setPredictionCol("prediction").setMetricName("rmse").evaluate(scored)
    Metrics(mae, rmse)
  }

  /** Score a feature frame with ALREADY-FITTED models — the
    * train-once/score-many serving shape. Purely distributed
    * (`transform` only, no refit, no driver collect). */
  def scoreNextDay(feats: DataFrame, primary: PipelineModel,
                   residual: PipelineModel): DataFrame = {
    val scored = residual.transform(
      primary.transform(feats).drop("features"))
    scored
      .withColumn("predicted_close", col("prediction") + col("residual_pred"))
      .select(
        col("user_id"),
        date_add(col("d"), 1).as("d"),
        col("close").as("previous_close"),
        round(col("predicted_close"), 4).as("predicted_close"))
  }

  /** F5 — corrected next-day predictions: primary + residual correction,
    * stamped onto trade_date + 1 (analyze...py:212-217). */
  def predictNextDay(spark: SparkSession, dir: String): DataFrame = {
    val feats = features(spark, dir).cache()
    try {
      val primary = fitPrimary(feats)
      val residual = fitResidual(primary, feats)
      scoreNextDay(feats, primary, residual)
    } finally feats.unpersist()
  }

  /** Persist both fitted stages under one root, mirroring the
    * reference's joblib dump of (model, scaler)
    * (analyze_news_stock_patterns.py:140-145). Spark-native ML
    * persistence (parquet metadata + coefficients) so a 1000-executor
    * scoring job loads the model without retraining. */
  def saveModels(primary: PipelineModel, residual: PipelineModel,
                 path: String): Unit = {
    primary.write.overwrite().save(s"$path/primary")
    residual.write.overwrite().save(s"$path/residual")
  }

  /** Load the (primary, residual) pair saved by [[saveModels]]
    * (analyze_news_stock_patterns.py:150-156 joblib load). */
  def loadModels(path: String): (PipelineModel, PipelineModel) =
    (PipelineModel.load(s"$path/primary"), PipelineModel.load(s"$path/residual"))
}
