package graft.ml

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus quality/topic classifier over document embeddings — the
  * FineWeb-Edu / CCNet-style filter shape: a small linear model scores
  * every document from its embedding, and downstream curation keeps or
  * buckets documents by the predicted class. Multinomial logistic
  * regression (spark.ml L-BFGS) over the raw embedding vector; scoring
  * is a distributed `transform`, so the expensive side (the 100 TB
  * corpus) never collects — only the model coefficients live on the
  * driver.
  *
  * The train/test split is decided by a 60-bit md5 hash of the row key
  * (same rationale and arithmetic as [[graft.operators.Sampling]]):
  * layout-independent, retry-stable, and replayable by any SQL engine —
  * which is what lets q_embed_classifier's oracle verify the split
  * counts exactly even though the model itself is not SQL-expressible.
  */
object EmbeddingClassifier {

  /** Uniform in [0, 1) from md5(key) — MUST stay in lockstep with the
    * oracle SQL in QueriesText (q_embed_classifier). */
  private def unit(keyCol: Column): Column =
    conv(substring(md5(keyCol.cast("string")), 1, 15), 16, 10)
      .cast("long").cast("double") / 1152921504606846976.0

  /** embeddings + is_train (md5 split at `trainFrac`) + ml features. */
  def withSplit(embeddings: DataFrame, trainFrac: Double = 0.8): DataFrame =
    embeddings
      .withColumn("is_train", unit(col("vec_id")) < trainFrac)
      .withColumn("features", array_to_vector(col("embedding")))

  /** Fit the multinomial LR on the training slice. */
  def fit(split: DataFrame): LogisticRegressionModel =
    new LogisticRegression()
      .setFeaturesCol("features").setLabelCol("label")
      .setMaxIter(100).setRegParam(1e-3).setTol(1e-7)
      .fit(split.filter(col("is_train")))

  /** Score a frame with an already-fitted model (train-once/score-many;
    * purely distributed). */
  def score(model: LogisticRegressionModel, df: DataFrame): DataFrame =
    model.transform(df)
      .select(col("vec_id"), col("label"), col("prediction").cast("int").as("predicted"))

  /** One-row metric gate: held-out accuracy must beat the
    * majority-class baseline (predict the most frequent TRAIN label
    * everywhere — the accuracy floor any useful classifier clears).
    * The oracle verifies n_train/n_test/n_labels exactly via the same
    * md5 split and asserts the bound held. */
  def metrics(embeddings: DataFrame, trainFrac: Double = 0.8): DataFrame = {
    val split = withSplit(embeddings, trainFrac).cache()
    try {
      val model = fit(split)
      val test = score(model, split.filter(!col("is_train")))
      val majority = split.filter(col("is_train"))
        .groupBy("label").count()
        .orderBy(col("count").desc, col("label"))
        .head.getAs[Any]("label")
      test.agg(
        count(lit(1)).as("n_test"),
        avg(when(col("predicted") === col("label"), 1.0).otherwise(0.0)).as("acc"),
        avg(when(col("label") === majority, 1.0).otherwise(0.0)).as("baseline"))
        .select(
          lit(split.filter(col("is_train")).count()).as("n_train"),
          col("n_test"),
          lit(split.select(count_distinct(col("label"))).head.getLong(0)).as("n_labels"),
          (col("acc") > col("baseline")).as("beats_baseline"))
    } finally split.unpersist()
  }
}
