package graft

import graft.ml.PricePredictor

/** F4/F5 — metric-level test (SURVEY.md §5: MAE/RMSE per
  * analyze_news_stock_patterns.py:129-133, not coefficient equality)
  * on the sf0.001 fixture data.
  */
class MlSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("primary model beats the naive persistence baseline on MAE") {
    val feats = PricePredictor.features(spark, dir).cache()
    val model = PricePredictor.fitPrimary(feats)
    val m = PricePredictor.evaluate(model, feats)
    // naive baseline: predict tomorrow = today
    import org.apache.spark.sql.functions._
    val naiveMae = feats.select(avg(abs(col("label") - col("close"))))
      .head().getDouble(0)
    assert(m.mae.isFinite && m.rmse >= m.mae)
    assert(m.mae <= naiveMae * 1.05,
      s"model MAE ${m.mae} should not be worse than naive $naiveMae")
    feats.unpersist()
  }

  test("predictNextDay emits one corrected row per (user, next day)") {
    val preds = PricePredictor.predictNextDay(spark, dir)
    val n = preds.count()
    assert(n > 0)
    assert(preds.select("user_id", "d").distinct().count() === n, "key-unique")
    assert(preds.filter(org.apache.spark.sql.functions.col("predicted_close").isNull).count() === 0)
  }

  test("embedding classifier separates synthetic clusters and beats the majority baseline") {
    import graft.ml.EmbeddingClassifier
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 4 well-separated Gaussian clusters in 8-d: any linear model must
    // recover them (deterministic seed; margin >> noise)
    val rng = new scala.util.Random(5)
    val centers = Array.tabulate(4, 8)((c, j) => if (j % 4 == c) 10.0 else 0.0)
    val rows = (0 until 200).map { i =>
      val c = i % 4
      (i.toLong, centers(c).map(x => (x + rng.nextGaussian() * 0.5).toFloat).toSeq, c)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val m = EmbeddingClassifier.metrics(df, trainFrac = 0.8)
      .as[(Long, Long, Long, Boolean)].head()
    assert(m._1 + m._2 === 200L, "split covers every row")
    assert(m._3 === 4L)
    assert(m._4, "classifier must beat the majority baseline on held-out rows")
    // the md5 split is deterministic: same counts on re-run
    val m2 = EmbeddingClassifier.metrics(df, trainFrac = 0.8)
      .as[(Long, Long, Long, Boolean)].head()
    assert(m === m2)
  }

  test("saved models reload and score identically to the in-memory fit") {
    val feats = PricePredictor.features(spark, dir).cache()
    try {
      val primary = PricePredictor.fitPrimary(feats)
      val residual = PricePredictor.fitResidual(primary, feats)
      val tmp = java.nio.file.Files.createTempDirectory("graft-ml").toString
      PricePredictor.saveModels(primary, residual, tmp)
      val (p2, r2) = PricePredictor.loadModels(tmp)
      val inMem = PricePredictor.scoreNextDay(feats, primary, residual)
        .collect().map(_.toSeq).sortBy(_.mkString("|"))
      val loaded = PricePredictor.scoreNextDay(feats, p2, r2)
        .collect().map(_.toSeq).sortBy(_.mkString("|"))
      assert(inMem.length > 0)
      assert(inMem.sameElements(loaded),
        "loaded-model predictions must be bit-identical to in-memory")
    } finally feats.unpersist()
  }
}
