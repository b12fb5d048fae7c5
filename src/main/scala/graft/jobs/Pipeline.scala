package graft.jobs

import graft.Tables
import graft.functions.Indicators
import graft.ml.PricePredictor
import graft.operators.DailySeries
import graft.sources.Sinks
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E1 — the reference's daily DAG (dags/trading_dashboard.py:47-100) as
  * a staged Spark pipeline over a parquet lake:
  *
  *   ingest (S4/S6 conform → DailySeries)           [stage 1]
  *   → merge into history (J1/W1/U1)                 [stage 2]
  *   → detect patterns (W2/W3/P14/U2)                [stage 3]
  *   → behavior analysis (A1/J2/U4)                  [stage 4]
  *   → train + predict (F4/F5/U5)                    [stage 5]
  *
  * Each stage is one DataFrame plan ending in a keyed merge — the same
  * idempotent upsert semantics the reference gets from ON CONFLICT, so
  * re-running a day is a no-op (PipelineSpec proves it). Airflow-level
  * orchestration stays external, exactly like the reference.
  */
object Pipeline {

  case class LakePaths(root: String) {
    val history = s"$root/stock_price_history"
    val patterns = s"$root/trading_patterns"
    val analysis = s"$root/news_stock_analysis"
    val predictions = s"$root/stock_predictions"
    val models = s"$root/price_model"
  }

  /** Stage 2 — merge the day's series into history (U1 DO-UPDATE). */
  def mergeHistory(spark: SparkSession, sfDir: String, lake: LakePaths): Unit = {
    val w = Indicators.series("user_id", "d")
    val daily = DailySeries(spark, sfDir)
      .withColumn("prev_close", Indicators.prev(col("close"), w))
    Sinks.mergeIntoPartitioned(daily, lake.history, Seq("user_id", "d"), "d", doUpdate = true)
  }

  /** Stage 3 — trend + MA-cross patterns over the merged history
    * (full_stock_pipeline.py:425-489), U2 DO-NOTHING on
    * (user, d, pattern). */
  def detectPatterns(spark: SparkSession, lake: LakePaths): Unit = {
    val hist = spark.read.parquet(lake.history)
    val w = Indicators.series("user_id", "d")
    val trend = hist
      .withColumn("c1", lag(col("close"), 1).over(w))
      .withColumn("c2", lag(col("close"), 2).over(w))
      .filter(col("c1").isNotNull && col("c2").isNotNull)
      .withColumn("pattern",
        when(col("close") > col("c1") && col("c1") > col("c2"), "Bullish Trend")
          .when(col("close") < col("c1") && col("c1") < col("c2"), "Bearish Trend"))
      .filter(col("pattern").isNotNull)
      .withColumn("pattern_category", lit("Trend Patterns"))
    // the MAs feed a comparison, and a comparison of double frame-sums
    // is engine-divergent on boundary rows (Spark sums frames
    // sequentially, other engines use segment trees) — so the frames
    // sum exact fixed-point micros of the close, same rationale as
    // q_w3_ma_cross, which is what lets q_e1_pipeline carry a
    // value-exact oracle over this stage's output
    val f5 = w.rowsBetween(-4, 0)
    val f20 = w.rowsBetween(-19, 0)
    def ma(frame: org.apache.spark.sql.expressions.WindowSpec) =
      sum(col("c6")).over(frame).cast("double") / (lit(1000000.0) * count(lit(1)).over(frame))
    val cross = hist
      .withColumn("c6", round(col("close") * 1000000).cast("long"))
      .withColumn("ma_fast", ma(f5))
      .withColumn("ma_slow", ma(f20))
      .withColumn("pattern",
        when(col("ma_fast") > col("ma_slow"), "Golden Cross")
          .when(col("ma_fast") < col("ma_slow"), "Death Cross"))
      .filter(col("pattern").isNotNull)
      .withColumn("pattern_category", lit("Moving Average Patterns"))
    val all = trend.select("user_id", "d", "pattern_category", "pattern")
      .unionByName(cross.select("user_id", "d", "pattern_category", "pattern"))
    Sinks.mergeIntoPartitioned(all, lake.patterns, Seq("user_id", "d", "pattern"), "d", doUpdate = false)
  }

  /** Stage 4 — per-(user, day) activity/price analysis
    * (analyze_news_stock_patterns.py:17-74), U4 DO-UPDATE. */
  def analyze(spark: SparkSession, sfDir: String, lake: LakePaths): Unit = {
    val w = Indicators.series("user_id", "d")
    val hist = spark.read.parquet(lake.history)
      .withColumn("price_change", col("close") - col("prev_close"))
      .withColumn("price_direction",
        when(col("price_change") > 0, "Up")
          .when(col("price_change") < 0, "Down")
          .otherwise("No Change"))
      .withColumn("volatility_score",
        when(col("low") > 0, (col("high") - col("low")) / col("low") * 100))
    val activity = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "view"))
      .groupBy(col("user_id"), col("event_date").as("d"))
      .agg(count(lit(1)).as("news_count"))
    val joined = activity.join(hist, Seq("user_id", "d"), "left")
      .select("user_id", "d", "news_count", "price_change", "price_direction",
        "volatility_score")
    Sinks.mergeIntoPartitioned(joined, lake.analysis, Seq("user_id", "d"), "d", doUpdate = true)
  }

  /** Stage 5 — train + next-day predictions (F4/F5), U5 DO-UPDATE.
    * Serves from the lake's persisted model artifact (r17 verdict #1):
    * the first run fits and publishes; a re-run of the same day finds
    * the training frame unchanged (growth 0%), skips the refit, and
    * scores with the SERVED model — the reference's own joblib
    * save/load split (analyze_news_stock_patterns.py:140-156), so
    * the predict stage stops being the pipeline's dominant fixed cost
    * on replays. For an UNCHANGED frame the output is identical (the
    * served model IS the one a fresh fit produces — MlSpec pins
    * load ≡ fit scoring); in-place value corrections and shrinks
    * refit immediately (the fingerprint witness), and pure sub-bound
    * growth rides at most one growth bound behind — so
    * q_e1_pipeline's oracle is untouched. */
  def predict(spark: SparkSession, sfDir: String, lake: LakePaths): Unit = {
    // train from the MERGED history stage 2 just wrote — exactly the
    // reference, which trains from stock_price_history
    // (analyze_news_stock_patterns.py:76-111), and one raw-events
    // aggregation cheaper than re-deriving the daily series; the bars
    // are value-identical, so the features (and q_e1's oracle) are too
    val feats = PricePredictor.featuresOf(
      spark.read.parquet(lake.history).drop("prev_close")).cache()
    try {
      graft.ml.ModelArtifact.init(spark, lake.models) // no-op once initialized
      graft.ml.ModelArtifact.maybeRefresh(spark, lake.models, feats)
      val preds = graft.ml.ModelArtifact.scoreServed(feats, lake.models)
      Sinks.mergeIntoPartitioned(preds, lake.predictions, Seq("user_id", "d"), "d", doUpdate = true)
    } finally feats.unpersist()
  }

  /** Per-stage wall seconds of the most recent [[run]] in this JVM —
    * telemetry only (the bench folds it into bench_full.json as
    * `e1_stages` so a pipeline regression localizes to a stage
    * instead of "q_e1_pipeline got slower", r14 verdict #7). Volatile
    * single-slot: the pipeline is single-writer per JVM like every
    * job here, and a stale read costs nothing but a stale number. */
  @volatile var lastStageSeconds: Seq[(String, Double)] = Nil

  /** Run the full E1 sequence, timing each stage. */
  def run(spark: SparkSession, sfDir: String, lakeRoot: String): LakePaths = {
    val lake = LakePaths(lakeRoot)
    def timed(name: String)(body: => Unit): (String, Double) = {
      val t0 = System.nanoTime()
      body
      name -> (System.nanoTime() - t0) / 1e9
    }
    lastStageSeconds = Seq(
      timed("merge_history") { mergeHistory(spark, sfDir, lake) },
      timed("detect_patterns") { detectPatterns(spark, lake) },
      timed("analyze") { analyze(spark, sfDir, lake) },
      timed("predict") { predict(spark, sfDir, lake) })
    lake
  }

  /** CLI: graft.jobs.Pipeline <sfDir> <lakeRoot> */
  def main(args: Array[String]): Unit = {
    val Array(sfDir, lakeRoot) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lake = run(spark, sfDir, lakeRoot)
    for (t <- Seq(lake.history, lake.patterns, lake.analysis, lake.predictions))
      println(s"$t: ${spark.read.parquet(t).count()} rows")
    spark.stop()
  }
}
