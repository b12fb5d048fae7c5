package graft

import graft.jobs.Pipeline
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** E1 end-to-end: full pipeline over sf0.001 into a temp lake; every
  * output table keyed-unique; re-running the whole pipeline (same day
  * re-processed) changes nothing — the reference's ON CONFLICT
  * idempotence, at pipeline granularity.
  */
class PipelineSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("full E1 run produces keyed tables; rerun is idempotent") {
    val lakeRoot = Files.createTempDirectory("graft-lake").toString
    val lake = Pipeline.run(spark, sfDir, lakeRoot)

    def snapshot(path: String, keys: Seq[String]): (Long, Long) = {
      val df = spark.read.parquet(path)
      val n = df.count()
      val k = df.select(keys.map(col): _*).distinct().count()
      (n, k)
    }
    val tables = Seq(
      lake.history -> Seq("user_id", "d"),
      lake.patterns -> Seq("user_id", "d", "pattern"),
      lake.analysis -> Seq("user_id", "d"),
      lake.predictions -> Seq("user_id", "d"))
    val first = tables.map { case (p, keys) =>
      val (n, k) = snapshot(p, keys)
      assert(n > 0, s"$p is empty")
      assert(n === k, s"$p has duplicate keys")
      p -> n
    }.toMap

    // rerun the whole pipeline over the same input
    Pipeline.run(spark, sfDir, lakeRoot)
    tables.foreach { case (p, keys) =>
      val (n, k) = snapshot(p, keys)
      assert(n === first(p), s"$p row count changed on rerun")
      assert(n === k)
    }
  }

  test("runDay: one-day incremental replay converges to the full-replay lake and serves the standing model") {
    val fullRoot = Files.createTempDirectory("graft-lakeF").toString
    val dayRoot = Files.createTempDirectory("graft-lakeD").toString
    val day = Tables.events(spark, sfDir).agg(max(col("event_date"))).head().getDate(0)
    val full = Pipeline.run(spark, sfDir, fullRoot)
    // standing lake: everything BEFORE the last day
    val inc = Pipeline.run(spark, sfDir, dayRoot, before = Some(day))
    val fitRows = graft.ml.ModelArtifact.servedVersionMeta(spark, inc.models)("train_rows")
    // replay exactly the last day against standing state
    Pipeline.runDay(spark, sfDir, dayRoot, day)
    def rows(p: String): Array[Seq[Any]] = {
      val df = spark.read.parquet(p)
      df.select(df.columns.sorted.map(col): _*).collect()
        .map(_.toSeq).sortBy(_.mkString("|"))
    }
    // the deterministic tables converge EXACTLY (the q_e1_day oracle
    // pins patterns against DuckDB; this pins the other two)
    for ((f, i) <- Seq(full.history -> inc.history,
        full.patterns -> inc.patterns, full.analysis -> inc.analysis)) {
      val (a, b) = (rows(f), rows(i))
      assert(a.length === b.length, s"$i row count diverged from full replay")
      assert(a.sameElements(b), s"$i diverged from the full replay")
    }
    // predictions: the day's sub-bound feature growth must NOT refit —
    // the artifact still serves the standup fit (staleness witness)...
    val feats = graft.ml.PricePredictor.featuresOf(
      spark.read.parquet(inc.history).drop("prev_close")).cache()
    try {
      val nFull = feats.count()
      assert(graft.ml.ModelArtifact.servedVersionMeta(spark, inc.models)("train_rows") === fitRows)
      assert(fitRows < nFull, "the served fit must be the documented one-bound-behind vintage")
      // ...and the stale-serving VALUES are pinned, not assumed (r18
      // advice): every prediction row equals the standing model scoring
      // the full feature frame — keys match the full replay, values
      // come from the one-day-stale fit
      val expected = graft.ml.ModelArtifact.scoreServed(feats, inc.models)
        .collect().map(_.toSeq).sortBy(_.mkString("|"))
      val got = rows(inc.predictions)
      val gotInExpectedOrder = {
        val df = spark.read.parquet(inc.predictions)
        df.select("user_id", "d", "previous_close", "predicted_close").collect()
          .map(_.toSeq).sortBy(_.mkString("|"))
      }
      assert(gotInExpectedOrder.length === expected.length)
      assert(gotInExpectedOrder.sameElements(expected),
        "incremental predictions must be exactly the standing model's scores")
      assert(got.length === rows(full.predictions).length,
        "prediction keys must match the full replay")
    } finally feats.unpersist()
  }

  test("predictDay scores a day-trading symbol whose previous trade predates the lookback") {
    import spark.implicits._
    val lake = Pipeline.LakePaths(Files.createTempDirectory("graft-lakeIdle").toString)
    val day = java.sql.Date.valueOf("2024-03-01")
    def d(s: String) = java.sql.Date.valueOf(s)
    // symbol 1 is idle 20 days (> the 5-day lookback) before trading on
    // `day`; its feature row at 2024-02-09 gets its label FROM `day`,
    // so the day replay must score it even though the symbol has no
    // fringe row inside the lookback (r19 review: an inner fringe join
    // silently dropped it from the predictions table)
    val hist = Seq(
      (1L, d("2024-02-08"), 10.0, 11.0, 9.0),
      (1L, d("2024-02-09"), 11.0, 12.0, 10.0),
      (1L, day, 12.0, 13.0, 11.0),
      (2L, d("2024-02-28"), 19.0, 20.0, 18.0),
      (2L, d("2024-02-29"), 20.0, 21.0, 19.0),
      (2L, day, 22.0, 23.0, 21.0)
    ).toDF("user_id", "d", "close", "high", "low")
    hist.write.partitionBy("d").parquet(lake.history)
    graft.ml.ModelArtifact.init(spark, lake.models)
    graft.ml.ModelArtifact.refresh(spark, lake.models,
      graft.ml.PricePredictor.featuresOf(spark.read.parquet(lake.history)))
    Pipeline.predictDay(spark, "unused-src-dir", lake, day, lookbackDays = 5)
    val preds = spark.read.parquet(lake.predictions)
      .select("user_id", "d").as[(Long, java.sql.Date)].collect().toSet
    assert(preds.contains((1L, d("2024-02-10"))),
      "the idle symbol's newly labeled feature row must produce its prediction")
    assert(preds.contains((2L, day)),
      "the dense symbol's fringe row must produce its next-day prediction")
  }

  test("patterns only contain the four defined categories") {
    val lakeRoot = Files.createTempDirectory("graft-lake2").toString
    val lake = Pipeline.run(spark, sfDir, lakeRoot)
    val pats = spark.read.parquet(lake.patterns)
      .select("pattern").distinct().collect().map(_.getString(0)).toSet
    assert(pats.subsetOf(Set("Bullish Trend", "Bearish Trend", "Golden Cross", "Death Cross")))
  }
}
