package graft.jobs

import graft.Tables
import graft.functions.Indicators
import graft.ml.PricePredictor
import graft.operators.DailySeries
import graft.sources.Sinks
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *
  * Two replay shapes, same stage logic ([[patternsOf]]/[[analysisOf]]
  * are the single definitions both run through):
  *  - [[run]] replays the WHOLE source history — the standup /
  *    backfill shape. Every merge rewrites every touched date
  *    partition, so its cost is history-proportional by design.
  *  - [[runDay]] replays ONE day against standing lake state — the
  *    production daily-cron shape (trading_dashboard.py:56 runs once
  *    per day). Each stage derives ONLY the day's rows (event scans
  *    partition-pruned to the day, pattern windows to a bounded
  *    lookback slice) and each merge rewrites ONE date partition;
  *    the predict stage ticks the model artifact and scores only the
  *    feature fringe the new day created unless the artifact
  *    actually refit. Honest cost split at 100 TB (r19 review): the
  *    three merge stages and every scan are day/lookback-
  *    proportional, while the predict stage still pays ONE window +
  *    ONE aggregation pass over standing history — the model
  *    artifact's documented tick contract (the full-frame identity
  *    and PSI witnesses are what make the refit decision sound); a
  *    deployment that must shed even that pass maintains the feature
  *    frame incrementally and ticks that table instead. q_e1_day
  *    oracle-pins that the incremental lake state is hash-identical
  *    to a full replay.
  */
object Pipeline {

  case class LakePaths(root: String) {
    val history = s"$root/stock_price_history"
    val patterns = s"$root/trading_patterns"
    val analysis = s"$root/news_stock_analysis"
    val predictions = s"$root/stock_predictions"
    val models = s"$root/price_model"
  }

  /** Trading-calendar lookback (calendar days) that bounds every
    * day-scoped history read. The windows need at most 19 preceding
    * TRADING rows per symbol (the MA-20), so the day path is exact
    * for any symbol with ≥ 20 trading rows inside the lookback — at
    * 365 days that covers down to roughly fortnightly traders (20
    * rows × 14 days = 280 < 365), not just the dense calendar (the
    * first cut said "120 ≈ 6 trading weeks per row"; the real
    * arithmetic is 6 CALENDAR days per row, which a weekly trader
    * already breaks — r19 review). A symbol SPARSER than that — or
    * idle past the whole bound — re-enters as a fresh series: its
    * day-path MA may average fewer rows than a full replay's, the
    * documented divergence the bound trades for partition-pruned
    * scans instead of full-history reads. Callers with stranger
    * calendars pass their own bound to [[runDay]]. */
  val DayLookback = 365

  /** Stage 2 — merge the day's series into history (U1 DO-UPDATE).
    * `before` (exclusive) bounds the source scan — the standup shape
    * for a lake that later ingests the remaining days via [[runDay]]. */
  def mergeHistory(spark: SparkSession, sfDir: String, lake: LakePaths,
                   before: Option[java.sql.Date] = None): Unit = {
    val w = Indicators.series("user_id", "d")
    val daily = before.foldLeft(DailySeries(spark, sfDir))(
        (df, b) => df.filter(col("d") < lit(b)))
      .withColumn("prev_close", Indicators.prev(col("close"), w))
    Sinks.mergeIntoPartitioned(daily, lake.history, Seq("user_id", "d"), "d", doUpdate = true)
  }

  /** [[mergeHistory]] for ONE day: the day's bars derive from the
    * day's events alone (the filter on the aggregate's grouping key
    * pushes to the scan), and prev_close comes from the STANDING
    * history's latest prior row per symbol inside [[DayLookback]] —
    * a partition-pruned, three-column scan joined broadcast (symbols
    * are a dimension), never a full-history window. The merge
    * rewrites exactly one date partition. */
  def mergeHistoryDay(spark: SparkSession, sfDir: String, lake: LakePaths,
                      day: java.sql.Date,
                      lookbackDays: Int = DayLookback): Unit = {
    val dayBars = DailySeries(spark, sfDir).filter(col("d") === lit(day))
    val fs = new org.apache.hadoop.fs.Path(lake.history)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prev =
      if (!fs.exists(new org.apache.hadoop.fs.Path(lake.history)))
        dayBars.select(col("user_id"), lit(null).cast("double").as("prev_close"))
          .limit(0)
      else spark.read.parquet(lake.history)
        .filter(col("d") >= date_sub(lit(day), lookbackDays) && col("d") < lit(day))
        .groupBy("user_id")
        .agg(max_by(col("close"), col("d")).as("prev_close"))
    val updates = dayBars.join(broadcast(prev), Seq("user_id"), "left")
    Sinks.mergeIntoPartitioned(updates, lake.history, Seq("user_id", "d"), "d", doUpdate = true)
  }

  /** The pattern derivation (full_stock_pipeline.py:425-489) over a
    * history slice — ONE definition for the whole-history and
    * single-day replays, so the two paths cannot drift. */
  private def patternsOf(hist: DataFrame): DataFrame = {
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
    trend.select("user_id", "d", "pattern_category", "pattern")
      .unionByName(cross.select("user_id", "d", "pattern_category", "pattern"))
  }

  /** Stage 3 — trend + MA-cross patterns over the merged history,
    * U2 DO-NOTHING on (user, d, pattern). */
  def detectPatterns(spark: SparkSession, lake: LakePaths): Unit = {
    val all = patternsOf(spark.read.parquet(lake.history))
    Sinks.mergeIntoPartitioned(all, lake.patterns, Seq("user_id", "d", "pattern"), "d", doUpdate = false)
  }

  /** [[detectPatterns]] for ONE day: the windows read a partition-
    * pruned [day − [[DayLookback]], day] history slice (every frame
    * is backward-looking, so the slice is sufficient context), the
    * output keeps the day's rows only, and the merge rewrites one
    * partition. */
  def detectPatternsDay(spark: SparkSession, lake: LakePaths,
                        day: java.sql.Date,
                        lookbackDays: Int = DayLookback): Unit = {
    val slice = spark.read.parquet(lake.history)
      .filter(col("d") >= date_sub(lit(day), lookbackDays) && col("d") <= lit(day))
    val dayRows = patternsOf(slice).filter(col("d") === lit(day))
    Sinks.mergeIntoPartitioned(dayRows, lake.patterns, Seq("user_id", "d", "pattern"), "d", doUpdate = false)
  }

  /** The per-(user, day) activity/price analysis
    * (analyze_news_stock_patterns.py:17-74) — ONE definition for both
    * replay shapes. */
  private def analysisOf(hist: DataFrame, activity: DataFrame): DataFrame = {
    val enriched = hist
      .withColumn("price_change", col("close") - col("prev_close"))
      .withColumn("price_direction",
        when(col("price_change") > 0, "Up")
          .when(col("price_change") < 0, "Down")
          .otherwise("No Change"))
      .withColumn("volatility_score",
        when(col("low") > 0, (col("high") - col("low")) / col("low") * 100))
    activity.join(enriched, Seq("user_id", "d"), "left")
      .select("user_id", "d", "news_count", "price_change", "price_direction",
        "volatility_score")
  }

  private def activityOf(spark: SparkSession, sfDir: String,
                         dayFilter: Column): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "view"))
      .filter(dayFilter)
      .groupBy(col("user_id"), col("event_date").as("d"))
      .agg(count(lit(1)).as("news_count"))

  /** Stage 4 — per-(user, day) activity/price analysis, U4 DO-UPDATE.
    * `before` (exclusive) bounds the event scan for the standup shape. */
  def analyze(spark: SparkSession, sfDir: String, lake: LakePaths,
              before: Option[java.sql.Date] = None): Unit = {
    val hist = spark.read.parquet(lake.history)
    val activity = activityOf(spark, sfDir,
      before.map(b => col("event_date") < lit(b)).getOrElse(lit(true)))
    val joined = analysisOf(hist, activity)
    Sinks.mergeIntoPartitioned(joined, lake.analysis, Seq("user_id", "d"), "d", doUpdate = true)
  }

  /** [[analyze]] for ONE day: the event scan prunes to the day, the
    * history join reads the day's single partition, the merge
    * rewrites one partition. */
  def analyzeDay(spark: SparkSession, sfDir: String, lake: LakePaths,
                 day: java.sql.Date): Unit = {
    val hist = spark.read.parquet(lake.history).filter(col("d") === lit(day))
    val activity = activityOf(spark, sfDir, col("event_date") === lit(day))
    val joined = analysisOf(hist, activity)
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
    * load ≡ fit scoring); in-place value corrections, shrinks and
    * distribution drift refit immediately (the fingerprint + PSI
    * witnesses), and pure sub-bound same-distribution growth rides at
    * most one growth bound behind (PipelineSpec pins that stale-serving
    * window's predictions explicitly) — so q_e1_pipeline's oracle is
    * untouched. */
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

  /** [[predict]] for ONE day: tick the artifact's drift loop (one
    * aggregation over the feature frame — the artifact's own
    * contract), then score ONLY the feature fringe the new day
    * created — adding day D materializes exactly each symbol's
    * feature row at ITS last prior trading day (the label just
    * arrived; per-symbol, not the global max — a symbol can skip the
    * market's latest session). When the artifact did NOT refit, every
    * older prediction is already in the lake and identical (same
    * model, same features — re-scoring the fringe of an unchanged
    * symbol upserts the same values); when it DID refit, every
    * prediction changed and the full frame re-scores (the honest
    * amortized cost). The no-refit merge touches only the fringe
    * partitions — one on a dense trading calendar. */
  def predictDay(spark: SparkSession, sfDir: String, lake: LakePaths,
                 day: java.sql.Date,
                 lookbackDays: Int = DayLookback): Unit = {
    val hist = spark.read.parquet(lake.history).drop("prev_close")
    val feats = PricePredictor.featuresOf(hist).cache()
    try {
      graft.ml.ModelArtifact.init(spark, lake.models) // no-op once initialized
      val refit = graft.ml.ModelArtifact.maybeRefresh(spark, lake.models, feats)
      val toScore = refit match {
        case Some(_) => feats
        case None =>
          // only the symbols the day touched can have new or changed
          // feature rows — a one-partition pruned scan
          val daySymbols = hist.filter(col("d") === lit(day))
            .select("user_id").distinct()
          // per-symbol fringe: the last trading day strictly before
          // `day`, inside the same lookback contract as every other
          // day-scoped scan (partition-pruned; symbols-sized
          // aggregates, joined broadcast). A day-trading symbol whose
          // previous trade predates the lookback has NO fringe row —
          // it must still score (LEFT join, null fringe keeps every
          // row: its whole per-symbol frame rescores, identical
          // values plus the new row), not silently drop its newly
          // labeled feature row from the predictions table (r19
          // review: the first cut's inner join lost that row until
          // some later refit)
          val fringe = hist
            .filter(col("d") >= date_sub(lit(day), lookbackDays) && col("d") < lit(day))
            .groupBy("user_id").agg(max(col("d")).as("__fringe_d"))
          feats.join(broadcast(daySymbols), Seq("user_id"))
            .join(broadcast(fringe), Seq("user_id"), "left")
            .filter(col("__fringe_d").isNull || col("d") >= col("__fringe_d"))
            .drop("__fringe_d")
      }
      val preds = graft.ml.ModelArtifact.scoreServed(toScore, lake.models)
      Sinks.mergeIntoPartitioned(preds, lake.predictions, Seq("user_id", "d"), "d", doUpdate = true)
    } finally feats.unpersist()
  }

  /** Per-stage wall seconds of the most recent [[run]] or [[runDay]]
    * in this JVM — telemetry only (the bench folds it into
    * bench_full.json as `e1_stages` so a pipeline regression localizes
    * to a stage instead of "q_e1_pipeline got slower", r14 verdict
    * #7). Volatile single-slot: the pipeline is single-writer per JVM
    * like every job here, and a stale read costs nothing but a stale
    * number. */
  @volatile var lastStageSeconds: Seq[(String, Double)] = Nil

  /** [[lastStageSeconds]]' twin for the most recent [[runDay]] —
    * separate slots so the bench can report both replay shapes
    * (q_e1_day running after q_e1_pipeline must not clobber the
    * full-replay stage map). */
  @volatile var lastDayStageSeconds: Seq[(String, Double)] = Nil

  private def timedStages(stages: Seq[(String, () => Unit)]): Seq[(String, Double)] =
    stages.map { case (name, body) =>
      val t0 = System.nanoTime()
      body()
      name -> (System.nanoTime() - t0) / 1e9
    }

  /** Run the full E1 sequence, timing each stage. `before` (exclusive)
    * bounds the source days — the standup shape for [[runDay]]. */
  def run(spark: SparkSession, sfDir: String, lakeRoot: String,
          before: Option[java.sql.Date] = None): LakePaths = {
    val lake = LakePaths(lakeRoot)
    lastStageSeconds = timedStages(Seq(
      "merge_history" -> (() => mergeHistory(spark, sfDir, lake, before)),
      "detect_patterns" -> (() => detectPatterns(spark, lake)),
      "analyze" -> (() => analyze(spark, sfDir, lake, before)),
      "predict" -> (() => predict(spark, sfDir, lake))))
    lake
  }

  /** Replay ONE day through all five stages against standing lake
    * state — the production daily-cron shape. Idempotent like [[run]]:
    * re-running a day converges to the same lake. */
  def runDay(spark: SparkSession, sfDir: String, lakeRoot: String,
             day: java.sql.Date,
             lookbackDays: Int = DayLookback): LakePaths = {
    val lake = LakePaths(lakeRoot)
    lastDayStageSeconds = timedStages(Seq(
      "merge_history" -> (() => mergeHistoryDay(spark, sfDir, lake, day, lookbackDays)),
      "detect_patterns" -> (() => detectPatternsDay(spark, lake, day, lookbackDays)),
      "analyze" -> (() => analyzeDay(spark, sfDir, lake, day)),
      "predict" -> (() => predictDay(spark, sfDir, lake, day, lookbackDays))))
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
