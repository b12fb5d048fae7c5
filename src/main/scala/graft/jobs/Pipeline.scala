package graft.jobs

import graft.Tables
import graft.functions.Indicators
import graft.ml.PricePredictor
import graft.operators.{Checkpoints, DailySeries}
import graft.sources.Sinks
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  *    lookback slice read ONCE and shared by every post-merge stage)
  *    and each merge rewrites ONE date partition; the predict stage
  *    maintains a standing FEATURE TABLE beside the history (the
  *    day's fringe feature rows merge in, day-sized), folds the model
  *    artifact's drift witnesses from exactly that delta (count is
  *    additive, the XOR fingerprint self-inverse, histogram buckets
  *    additive under stored edges — [[graft.ml.ModelArtifact
  *    .maybeRefreshFolded]]), and scores only the fringe unless the
  *    artifact actually refit. Since r20 every daily pass — scans,
  *    merges AND the drift tick — is day/lookback-proportional (the
  *    r19 verdict's last table-proportional pass, the full-frame
  *    tick, is closed); a refit day still pays its amortized full
  *    training pass, which is the fit's own cost, not the tick's.
  *    q_e1_day oracle-pins that the incremental lake state is
  *    hash-identical to a full replay.
  *
  * APPEND-ONLY CONTRACT ([[requireAppendOnly]], loud): [[runDay]]
  * replays the NEWEST day only — `day` must be ≥ every date already in
  * standing history. Merging a late-arriving/backfill day behind the
  * frontier would rewrite only that day's partitions while a full
  * replay would also change LATER dates' lags, MAs, analysis rows and
  * labels — the lake would silently diverge from the hash-pinned
  * full-replay equivalence. Backfills go through [[run]].
  */
object Pipeline {

  case class LakePaths(root: String) {
    val history = s"$root/stock_price_history"
    val patterns = s"$root/trading_patterns"
    val analysis = s"$root/news_stock_analysis"
    val predictions = s"$root/stock_predictions"
    val models = s"$root/price_model"
    /** The DAY path's standing feature table — [[PricePredictor
      * .featuresOf]] of the history, maintained incrementally by
      * [[predictDay]] (bootstrap on first use, day-sized fringe merges
      * after) and INVALIDATED by a whole-history [[predict]] (which
      * recomputes everything anyway; the next [[runDay]] re-bootstraps). */
    val features = s"$root/price_features"
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
    * idle past the whole bound — re-enters as a fresh series for the
    * PATTERN windows: its day-path MA may average fewer rows than a
    * full replay's, the documented divergence the bound trades for
    * partition-pruned scans instead of full-history reads. The
    * prev_close/analysis and feature-fringe paths do NOT share that
    * divergence: symbols with no (or too little) lookback context
    * fall back to an unbounded per-symbol read ([[mergeHistoryDay]]'s
    * orphan max_by, [[dayFeatureDelta]]'s short-context scope) — rare
    * by construction, loud in neither, exact in both (r19 advice).
    * Callers with stranger calendars pass their own bound to
    * [[runDay]]. */
  val DayLookback = 365

  /** UTC epoch second of a date's midnight — the raw-pushdown bound
    * equivalent to an `event_date`/`d` comparison (event_date is the
    * UTC floor-to-day of ts, so `d < b` ⟺ `ts < epochSec(b)` and
    * `d === day` ⟺ ts ∈ [epochSec(day), epochSec(day)+86400)). */
  private def epochSec(d: java.sql.Date): Long =
    d.toLocalDate.toEpochDay * 86400L

  /** Stage 2 — merge the day's series into history (U1 DO-UPDATE).
    * `before` (exclusive) bounds the source scan — the standup shape
    * for a lake that later ingests the remaining days via [[runDay]];
    * the bound reaches the RAW parquet scan (r22, guide §6 — a filter
    * on the derived `d` never pushes down). */
  def mergeHistory(spark: SparkSession, sfDir: String, lake: LakePaths,
                   before: Option[java.sql.Date] = None): Unit = {
    val w = Indicators.series("user_id", "d")
    val daily = DailySeries.between(spark, sfDir, None, before.map(epochSec))
      .withColumn("prev_close", Indicators.prev(col("close"), w))
    Sinks.mergeIntoPartitioned(daily, lake.history, Seq("user_id", "d"), "d", doUpdate = true)
  }

  /** [[mergeHistory]] for ONE day: the day's bars derive from the
    * day's events alone (the filter on the aggregate's grouping key
    * pushes to the scan), and prev_close comes from the STANDING
    * history's latest prior row per symbol inside the lookback — a
    * partition-pruned, three-column scan joined broadcast (symbols
    * are a dimension), never a full-history window. A day symbol with
    * NO prior row inside the lookback (idle past the bound) falls
    * back to an unbounded per-symbol max_by — the full replay's lag
    * finds its old close regardless of age, and without the fallback
    * the analysis table's price_change/price_direction would silently
    * diverge for long-idle symbols (r19 advice). The fallback scan is
    * symbol-filtered and runs only when such symbols exist at all
    * (zero extra cost on a dense calendar). The merge rewrites exactly
    * one date partition. */
  def mergeHistoryDay(spark: SparkSession, sfDir: String, lake: LakePaths,
                      day: java.sql.Date,
                      lookbackDays: Int = DayLookback,
                      preSlice: Option[DataFrame] = None): Unit = {
    // pinned: consumed by the orphan anti-join, the updates join and
    // the merge's touched-partition collect — one source aggregation.
    // The day bound reaches the RAW events scan (r22, guide §6): the
    // old `filter(d === day)` on the derived column read the whole
    // events lake to derive one day's bars.
    val dayBars = Checkpoints.pin(
      DailySeries.between(spark, sfDir,
          Some(epochSec(day)), Some(epochSec(day) + 86400L))
        .filter(col("d") === lit(day)))
    val fs = new org.apache.hadoop.fs.Path(lake.history)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prev =
      if (!fs.exists(new org.apache.hadoop.fs.Path(lake.history)))
        dayBars.select(col("user_id"), lit(null).cast("double").as("prev_close"))
          .limit(0)
      else {
        val hist = spark.read.parquet(lake.history)
        // the [day − lookback, day) read: from the caller's shared
        // cached slice when provided (r21 — runDay otherwise paid this
        // partition-pruned scan twice, once here and once for the
        // post-merge lookback slice), a fresh pruned scan otherwise
        val inLookback = Checkpoints.pin(preSlice.getOrElse(hist
            .filter(col("d") >= date_sub(lit(day), lookbackDays) && col("d") < lit(day)))
          .groupBy("user_id")
          .agg(max_by(col("close"), col("d")).as("prev_close")))
        val orphans = dayBars.select("user_id").distinct()
          .join(inLookback.select("user_id"), Seq("user_id"), "left_anti")
        if (orphans.isEmpty) inLookback
        else inLookback.unionByName(hist
          .filter(col("d") < lit(day))
          .join(broadcast(orphans), Seq("user_id"))
          .groupBy("user_id")
          .agg(max_by(col("close"), col("d")).as("prev_close")))
      }
    val updates = dayBars.join(broadcast(prev), Seq("user_id"), "left")
    Sinks.mergeIntoPartitioned(updates, lake.history, Seq("user_id", "d"), "d", doUpdate = true)
  }

  /** The pattern derivation (full_stock_pipeline.py:425-489) over a
    * history slice — ONE definition for the whole-history and
    * single-day replays, so the two paths cannot drift.
    *
    * Fused into ONE window pass (optimization guide §2.4, r21): the
    * trend lags and both MA frames share the same (user_id, d)
    * partitioning and ordering, so deriving them as one projection
    * costs one Exchange + one Sort; the old two-branch union re-
    * scanned and re-shuffled the history once per branch (2 scans,
    * 2 Exchanges, 2 Sorts → 1/1/1, verified in plans/r21). Each row
    * then explodes into its ≤2 pattern candidates — exactly the rows
    * the two branches produced, proven by the unchanged q_e1 oracle.
    *
    * The MAs feed a comparison, and a comparison of double frame-sums
    * is engine-divergent on boundary rows (Spark sums frames
    * sequentially, other engines use segment trees) — so the frames
    * sum exact fixed-point micros of the close, same rationale as
    * q_w3_ma_cross, which is what lets q_e1_pipeline carry a
    * value-exact oracle over this stage's output. */
  private def patternsOf(hist: DataFrame): DataFrame = {
    val w = Indicators.series("user_id", "d")
    val f5 = w.rowsBetween(-4, 0)
    val f20 = w.rowsBetween(-19, 0)
    def ma(frame: org.apache.spark.sql.expressions.WindowSpec) =
      sum(col("c6")).over(frame).cast("double") / (lit(1000000.0) * count(lit(1)).over(frame))
    val trendPattern =
      // the lag null-guard reproduces the old branch's pre-filter
      // (first two rows of a series emit no trend row)
      when(col("c1").isNotNull && col("c2").isNotNull,
        when(col("close") > col("c1") && col("c1") > col("c2"), "Bullish Trend")
          .when(col("close") < col("c1") && col("c1") < col("c2"), "Bearish Trend"))
    val crossPattern =
      when(col("ma_fast") > col("ma_slow"), "Golden Cross")
        .when(col("ma_fast") < col("ma_slow"), "Death Cross")
    hist
      .withColumn("c6", round(col("close") * 1000000).cast("long"))
      .withColumn("c1", lag(col("close"), 1).over(w))
      .withColumn("c2", lag(col("close"), 2).over(w))
      .withColumn("ma_fast", ma(f5))
      .withColumn("ma_slow", ma(f20))
      .select(col("user_id"), col("d"),
        explode(array(
          struct(lit("Trend Patterns").as("pattern_category"),
            trendPattern.as("pattern")),
          struct(lit("Moving Average Patterns").as("pattern_category"),
            crossPattern.as("pattern")))).as("p"))
      .filter(col("p.pattern").isNotNull)
      .select(col("user_id"), col("d"),
        col("p.pattern_category").as("pattern_category"),
        col("p.pattern").as("pattern"))
  }

  /** Stage 3 — trend + MA-cross patterns over the merged history,
    * U2 DO-NOTHING on (user, d, pattern). Reads its own column-pruned
    * scan of the lake (user_id, d, close — see [[run]]). */
  def detectPatterns(spark: SparkSession, lake: LakePaths): Unit = {
    val all = patternsOf(spark.read.parquet(lake.history))
    Sinks.mergeIntoPartitioned(all, lake.patterns, Seq("user_id", "d", "pattern"), "d", doUpdate = false)
  }

  /** [[detectPatterns]] for ONE day: the windows read a partition-
    * pruned [day − lookback, day] history slice (every frame is
    * backward-looking, so the slice is sufficient context), the
    * output keeps the day's rows only, and the merge rewrites one
    * partition. `slice` lets [[runDay]] hand in the ONE shared
    * lookback read all post-merge stages reuse. */
  def detectPatternsDay(spark: SparkSession, lake: LakePaths,
                        day: java.sql.Date,
                        lookbackDays: Int = DayLookback,
                        slice: Option[DataFrame] = None): Unit = {
    val lb = slice.getOrElse(lookbackSlice(spark, lake, day, lookbackDays))
    val dayRows = patternsOf(lb).filter(col("d") === lit(day))
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

  /** Activity rollup over a raw-pushdown-bounded events scan (r22,
    * guide §6 — the old derived-column dayFilter never reached the
    * parquet reader, so the day path scanned the whole lake). */
  private def activityOf(spark: SparkSession, sfDir: String,
                         fromSec: Option[Long], untilSec: Option[Long]): DataFrame = {
    val ev = (fromSec, untilSec) match {
      case (Some(f), Some(u)) => Tables.eventsBetween(spark, sfDir, f, u)
      case (Some(f), None)    => Tables.eventsFrom(spark, sfDir, f)
      case (None, Some(u))    => Tables.eventsUntil(spark, sfDir, u)
      case (None, None)       => Tables.events(spark, sfDir)
    }
    ev.filter(col("event_type").isin("click", "view"))
      .groupBy(col("user_id"), col("event_date").as("d"))
      .agg(count(lit(1)).as("news_count"))
  }

  /** Stage 4 — per-(user, day) activity/price analysis, U4 DO-UPDATE.
    * `before` (exclusive) bounds the event scan for the standup shape
    * (pushed to the raw scan). */
  def analyze(spark: SparkSession, sfDir: String, lake: LakePaths,
              before: Option[java.sql.Date] = None): Unit = {
    val hist = spark.read.parquet(lake.history)
    val activity = activityOf(spark, sfDir, None, before.map(epochSec))
    val joined = analysisOf(hist, activity)
    Sinks.mergeIntoPartitioned(joined, lake.analysis, Seq("user_id", "d"), "d", doUpdate = true)
  }

  /** [[analyze]] for ONE day: the event scan prunes to the day AT THE
    * PARQUET READER (ts bounds, not the derived event_date), the
    * history join reads the day's rows (from the shared `slice` when
    * [[runDay]] provides it), the merge rewrites one partition. */
  def analyzeDay(spark: SparkSession, sfDir: String, lake: LakePaths,
                 day: java.sql.Date,
                 slice: Option[DataFrame] = None): Unit = {
    val hist = slice.getOrElse(spark.read.parquet(lake.history))
      .filter(col("d") === lit(day))
    val activity = activityOf(spark, sfDir,
      Some(epochSec(day)), Some(epochSec(day) + 86400L))
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
    * untouched. Invalidates the DAY path's standing feature table:
    * this whole-history pass recomputes everything the table caches,
    * and a later [[runDay]] re-bootstraps it (maintaining it here
    * would tax every full replay for a table only the day path reads). */
  def predict(spark: SparkSession, sfDir: String, lake: LakePaths): Unit = {
    // train from the MERGED history stage 2 just wrote — exactly the
    // reference, which trains from stock_price_history
    // (analyze_news_stock_patterns.py:76-111), and one raw-events
    // aggregation cheaper than re-deriving the daily series; the bars
    // are value-identical, so the features (and q_e1's oracle) are too
    val feats = PricePredictor.featuresOf(
      spark.read.parquet(lake.history).drop("prev_close")).cache()
    try {
      val fs = new org.apache.hadoop.fs.Path(lake.features)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(lake.features), true)
      graft.ml.ModelArtifact.init(spark, lake.models) // no-op once initialized
      graft.ml.ModelArtifact.maybeRefresh(spark, lake.models, feats)
      val preds = graft.ml.ModelArtifact.scoreServed(feats, lake.models)
      Sinks.mergeIntoPartitioned(preds, lake.predictions, Seq("user_id", "d"), "d", doUpdate = true)
    } finally feats.unpersist()
  }

  /** The feature rows day `day` changed — per touched symbol, exactly
    * its FRINGE row (the last trading day strictly before `day`: the
    * label just arrived from `day`'s close; for a re-run of `day`, the
    * same row re-derives with the corrected label). Under the
    * append-only contract these are the ONLY rows of the full feature
    * frame that differ from before the merge: `day` is every touched
    * symbol's newest row, its own feature row has no label yet, and
    * no other row's lag/lead window reaches `day`.
    *
    * Derivation cost is day-proportional: each symbol needs its last
    * THREE rows ≤ `day` (fringe−1 feeds the fringe's prev_close/
    * pct_change, `day` feeds its label). Symbols with ≥3 rows inside
    * the lookback take them from the shared partition-pruned slice; a
    * symbol with fewer (idle past the bound, or genuinely new) reads
    * its last three rows unbounded but symbol-filtered — rare by
    * construction, and skipped entirely when no such symbol exists.
    * [[PricePredictor.featuresOf]] over that 3-row context yields
    * exactly the fringe row with values IDENTICAL to the full frame's
    * (first row drops on null prev_close, `day`'s drops on null
    * label), which is what makes the witness fold and the standing
    * feature table exact, not approximate (PipelineSpec pins both). */
  private def dayFeatureDelta(spark: SparkSession, lake: LakePaths,
                              day: java.sql.Date, lookbackDays: Int,
                              slice: Option[DataFrame]): DataFrame = {
    val hist = spark.read.parquet(lake.history).drop("prev_close")
    val lb = slice.map(_.drop("prev_close")).getOrElse(
      lookbackSlice(spark, lake, day, lookbackDays).drop("prev_close"))
    val daySymbols = lb.filter(col("d") === lit(day)).select("user_id").distinct()
    val scope = lb.join(broadcast(daySymbols), Seq("user_id"))
    // ONE symbols-dimension collect decides the safe/unsafe split —
    // the same bounded-cardinality trade every broadcast here already
    // makes, and it saves a pin + an isEmpty probe + a filter join per
    // day; on the common all-safe day the fast context needs NO join
    // at all
    val counts = scope.groupBy("user_id").agg(count(lit(1)).as("__n")).collect()
    val unsafeSyms = counts.filter(_.getLong(1) < 3).map(_.getLong(0)).toSeq
    val w = Window.partitionBy("user_id").orderBy(col("d").desc)
    def lastThree(df: DataFrame): DataFrame =
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= 3).drop("__rn")
    val ctx =
      if (unsafeSyms.isEmpty) lastThree(scope)
      else lastThree(scope.filter(!col("user_id").isInCollection(unsafeSyms)))
        .unionByName(lastThree(
          hist.filter(col("d") <= lit(day))
            .filter(col("user_id").isInCollection(unsafeSyms))))
    PricePredictor.featuresOf(ctx)
  }

  /** The standing feature rows a delta will REPLACE — the old half of
    * the witness fold (empty for pure inserts). Partition-pruned to
    * the delta's (few) fringe dates, key-matched broadcast. */
  private def oldFeatureRows(spark: SparkSession, featPath: String,
                             delta: DataFrame): DataFrame = {
    val days = delta.select("d").distinct().collect().map(_.getDate(0)).toSeq
    if (days.isEmpty) spark.read.parquet(featPath).filter(lit(false))
    else spark.read.parquet(featPath)
      .filter(col("d").isInCollection(days))
      .join(broadcast(delta.select("user_id", "d")), Seq("user_id", "d"), "left_semi")
  }

  /** [[predict]] for ONE day — every pass day-proportional (r19
    * verdict #1 closed):
    *
    *  1. derive the day's feature DELTA ([[dayFeatureDelta]] — fringe
    *     rows only, lookback-pruned with a rare unbounded-per-symbol
    *     escape hatch);
    *  2. merge it into the standing feature table (one-to-few date
    *     partitions; bootstrap = one full derivation, first day only);
    *  3. tick the model artifact by FOLDING the delta into the
    *     maintained witnesses ([[graft.ml.ModelArtifact
    *     .maybeRefreshFolded]]) — the decision is identical to a
    *     full-frame tick because the folded (count, fp, buckets) are
    *     equal to a full measurement, not approximations;
    *  4. score ONLY the delta when the artifact did not refit (every
    *     older prediction is already in the lake and identical — same
    *     model, same features); a refit re-scores the full standing
    *     table, the honest amortized cost a refit always was.
    *
    * Assumes the [[runDay]] append-only contract (`day` ≥ the standing
    * frontier) — that is precisely what makes the fringe rows the
    * complete delta. */
  def predictDay(spark: SparkSession, sfDir: String, lake: LakePaths,
                 day: java.sql.Date,
                 lookbackDays: Int = DayLookback,
                 slice: Option[DataFrame] = None): Unit = {
    graft.ml.ModelArtifact.init(spark, lake.models) // no-op once initialized
    val featP = new org.apache.hadoop.fs.Path(lake.features)
    val fs = featP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val delta = Checkpoints.pin(
      dayFeatureDelta(spark, lake, day, lookbackDays, slice))
    val refit =
      if (!fs.exists(featP)) {
        // bootstrap: one full derivation stands the table up and one
        // full tick bases the witness — every later day folds
        val feats = PricePredictor.featuresOf(
          spark.read.parquet(lake.history).drop("prev_close")).cache()
        try {
          Sinks.mergeIntoPartitioned(feats, lake.features,
            Seq("user_id", "d"), "d", doUpdate = true)
          val out = graft.ml.ModelArtifact.maybeRefresh(spark, lake.models, feats)
          // the bootstrap's full tick IS this day's measurement — stamp
          // it so the day's re-run folds instead of re-basing once
          graft.ml.ModelArtifact.stampWitDay(spark, lake.models,
            day.toLocalDate.toEpochDay)
          out
        } finally feats.unpersist()
      } else {
        // pinned EAGERLY: the merge below rewrites exactly these
        // partitions, and a lazy plan would read the post-merge files —
        // folding "old == new" and silently missing every replacement
        val old = Checkpoints.pin(oldFeatureRows(spark, lake.features, delta))
        Sinks.mergeIntoPartitioned(delta, lake.features,
          Seq("user_id", "d"), "d", doUpdate = true)
        graft.ml.ModelArtifact.maybeRefreshFolded(spark, lake.models,
          day.toLocalDate.toEpochDay, old, delta,
          () => spark.read.parquet(lake.features))
      }
    val toScore = refit match {
      case Some(_) => spark.read.parquet(lake.features)
      case None => delta
    }
    val preds = graft.ml.ModelArtifact.scoreServed(toScore, lake.models)
    Sinks.mergeIntoPartitioned(preds, lake.predictions, Seq("user_id", "d"), "d", doUpdate = true)
  }

  /** The one partition-pruned standing-history read every post-merge
    * day stage works from: [day − lookback, day]. */
  private def lookbackSlice(spark: SparkSession, lake: LakePaths,
                            day: java.sql.Date, lookbackDays: Int): DataFrame =
    spark.read.parquet(lake.history)
      .filter(col("d") >= date_sub(lit(day), lookbackDays) && col("d") <= lit(day))

  /** The [[runDay]] append-only guard: `day` must be ≥ every date
    * already in standing history (equality = the sanctioned re-run of
    * the frontier day). A late-arriving day would rewrite only its own
    * partitions while the full replay it is hash-pinned against would
    * also change LATER dates' lags/MAs/analysis/labels — silent
    * divergence, so it fails LOUDLY here instead. Cost: one partition-
    * directory listing, no data scan. */
  private def requireAppendOnly(spark: SparkSession, lake: LakePaths,
                                day: java.sql.Date): Unit = {
    val p = new org.apache.hadoop.fs.Path(lake.history)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return
    // hive-style `d=YYYY-MM-DD` dir names: ISO dates compare correctly
    // as strings, no parse needed
    val frontier = fs.listStatus(p).iterator
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => n.startsWith("d=") && !n.endsWith("__HIVE_DEFAULT_PARTITION__"))
      .map(_.stripPrefix("d="))
      .foldLeft(Option.empty[String])((m, v) => Some(m.fold(v)(x => if (x >= v) x else v)))
    frontier.foreach { f =>
      require(day.toString >= f,
        s"runDay($day) behind the standing frontier $f: a late-arriving day " +
          "would rewrite only its own partitions while later dates' lags, MAs, " +
          "analysis rows and labels already derived WITHOUT it — the lake would " +
          "silently diverge from the full-replay equivalence. Backfill through " +
          "Pipeline.run instead")
    }
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
    // Each post-merge stage reads the lake itself (r22, guide §5):
    // r21 cached the WHOLE history here for stages 3–5, which defeats
    // per-stage column pruning (each stage needs a different narrow
    // slice) and at lake scale spills the entire table to executor
    // disk to save two pruned parquet scans — strictly worse than
    // re-scanning columnar storage, and measurably slower at sf0.1
    // (q_e1_pipeline 7.5→17.0 s driver-side).
    lastStageSeconds = timedStages(Seq(
      "merge_history" -> (() => mergeHistory(spark, sfDir, lake, before)),
      "detect_patterns" -> (() => detectPatterns(spark, lake)),
      "analyze" -> (() => analyze(spark, sfDir, lake, before)),
      "predict" -> (() => predict(spark, sfDir, lake))))
    lake
  }

  /** Replay ONE day through all five stages against standing lake
    * state — the production daily-cron shape. Idempotent like [[run]]:
    * re-running a day converges to the same lake. Loud when `day` is
    * behind the standing frontier ([[requireAppendOnly]]). The merged
    * lookback slice is read ONCE and shared by every post-merge stage
    * (r19 verdict #6: three redundant pruned scans per day otherwise);
    * the cache spills past memory, and the slice never couples stage
    * failure domains — each stage's merge is its own job with its own
    * staged promote.
    *
    * Retry contract: a FAILED runDay must be retried to completion
    * before a later day replays — every stage merge is idempotent, so
    * the retry converges (the witness crash window inside the retry is
    * detected and re-based, [[graft.ml.ModelArtifact
    * .maybeRefreshFolded]]), but SKIPPING a failed day's predict stage
    * would leave that day's fringe rows out of the standing feature
    * table with nothing left to detect them. The external scheduler
    * owns this day-to-day dependency, exactly as the reference's
    * Airflow DAG does (trading_dashboard.py task ordering). */
  def runDay(spark: SparkSession, sfDir: String, lakeRoot: String,
             day: java.sql.Date,
             lookbackDays: Int = DayLookback): LakePaths = {
    val lake = LakePaths(lakeRoot)
    requireAppendOnly(spark, lake, day)
    var slice: DataFrame = null
    try {
      lastDayStageSeconds = timedStages(Seq(
        "merge_history" -> (() => {
          // ONE pruned [day − lookback, day) scan, PINNED pre-merge
          // (eager localCheckpoint/checkpoint) and shared by the
          // merge's prev_close aggregate AND the post-merge slice
          // (r21, guide §2.4: the day path paid this scan twice).
          // Eager pinning — not a lazy cache — is what makes reuse
          // across the merge safe BY CONSTRUCTION: the rows are
          // materialized before any file is rewritten, so correctness
          // no longer rests on the merge touching only day's own
          // partition (r21 verdict #5; PipelineSpec pins it). The
          // post-merge slice (pre ∪ the day's merged rows) is then
          // cached once and shared by stages 3–5, which otherwise
          // re-pay the union + day-partition read each (ADVICE r21).
          val fs = new org.apache.hadoop.fs.Path(lake.history)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          val pre =
            if (!fs.exists(new org.apache.hadoop.fs.Path(lake.history))) None
            else Some(Checkpoints.pin(spark.read.parquet(lake.history)
              .filter(col("d") >= date_sub(lit(day), lookbackDays) && col("d") < lit(day))))
          mergeHistoryDay(spark, sfDir, lake, day, lookbackDays, pre)
          val dayRows = spark.read.parquet(lake.history)
            .filter(col("d") === lit(day))
          slice = pre.fold(dayRows)(_.unionByName(dayRows)).cache()
        }),
        "detect_patterns" -> (() =>
          detectPatternsDay(spark, lake, day, lookbackDays, Some(slice))),
        "analyze" -> (() => analyzeDay(spark, sfDir, lake, day, Some(slice))),
        "predict" -> (() =>
          predictDay(spark, sfDir, lake, day, lookbackDays, Some(slice)))))
    } finally if (slice != null) slice.unpersist()
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
