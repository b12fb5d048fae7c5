package graft.streaming

import graft.operators.Profile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming drift alarms — the operational composition on top of the
  * quantile-artifact telemetry: every micro-batch is sketched
  * ([[graft.operators.Profile.logHistogram]]), compared against the
  * artifact-so-far ([[graft.operators.Profile.psiFromLogHistograms]]
  * — PSI per group, banded stable/drifting/shifted at the
  * conventional 0.1/0.25 thresholds), the alarm row is LOGGED, and
  * only then does the batch fold into the artifact — so batch i is
  * always judged against batches 0..i−1, "is the new data shifting
  * against everything before it", from standing kilobyte state.
  *
  * Replay protocol (single writer, like every artifact): the alarm
  * for batch i is written BEFORE the fold, and the alarm compute is
  * double-gated — skipped when the alarm already COMMITTED (its
  * `_SUCCESS` marker) or when the batch already FOLDED (its `_fp`
  * fingerprint), because after the fold the artifact includes the
  * batch and a recomputed PSI would judge the batch against itself.
  * Crash windows: mid-alarm-write → neither gate holds, the fold
  * hasn't run, so the replay recomputes faithfully and the overwrite
  * heals the debris; between alarm and fold → alarm gate holds, fold
  * proceeds; after fold → both paths skip. The first batch has
  * nothing to compare against — no alarm row, by design (and the
  * fold gate keeps a redelivery from fabricating one). Groups absent
  * from a batch are not judged — absence is not drift.
  */
object StreamingDrift {

  /** One micro-batch of the monitor; exposed for direct testing. */
  def processBatch(batch: DataFrame, batchId: Long, groupCol: String,
                   valueCol: String, artifactPath: String,
                   alarmPath: String): Unit = {
    val spark = batch.sparkSession
    val meta = graft.sources.IndexMeta.read(spark,
      s"$artifactPath/meta.json", "quantile artifact")
    val mbits = meta("mbits").toInt
    val alarmDir = new org.apache.hadoop.fs.Path(s"$alarmPath/b=$batchId")
    val fs = alarmDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // two gates (r15 review). Alarm _SUCCESS: a crash mid-alarm-write
    // leaves a partial dir but no marker, and since the fold below
    // hasn't run the replay's recompute is faithful and the overwrite
    // heals the debris. Fold _fp: a batch that ALREADY folded must
    // never be re-judged — the artifact now contains it, so the
    // recomputed PSI would compare the batch against itself (the
    // first batch would even gain the alarm row it correctly never
    // had: prior was empty then, non-empty on replay).
    val alarmCommitted =
      fs.exists(new org.apache.hadoop.fs.Path(alarmDir, "_SUCCESS"))
    val alreadyFolded = fs.exists(new org.apache.hadoop.fs.Path(
      s"$artifactPath/parts/b=$batchId/_fp"))
    if (!alarmCommitted && !alreadyFolded) {
      val prior = Profile.readQuantileArtifact(spark, artifactPath)
        .localCheckpoint() // judged state must not move under the fold below
      if (!prior.isEmpty) {
        val sk = Profile.logHistogram(batch.select(col(groupCol), col(valueCol)),
          groupCol, valueCol, mbits)
          .localCheckpoint() // feeds the psi AND the group restriction
        // judge only the GROUP INTERSECTION: a group with no new rows
        // isn't drifting, it's absent (comparing its prior mass
        // against nothing fabricates a 'shifted' alarm for every
        // low-traffic group that skips a micro-batch), and a
        // first-appearance group has no baseline to be judged
        // against — its debut batch IS the baseline
        Profile.psiFromLogHistograms(
            prior.join(sk.select(col("g")).distinct(), Seq("g"), "left_semi"),
            sk.join(prior.select(col("g")).distinct(), Seq("g"), "left_semi"))
          .groupBy("g")
          .agg(sort_array(collect_list(
            struct(col("e"), col("s"), col("term")))).as("cs"))
          .select(col("g"),
            aggregate(col("cs"), lit(0.0),
              (a, x) => a + x.getField("term")).as("psi"))
          .withColumn("status",
            when(col("psi") < 0.1, lit("stable"))
              .when(col("psi") < 0.25, lit("drifting"))
              .otherwise(lit("shifted")))
          .coalesce(1).write.mode("overwrite").parquet(alarmDir.toString)
      }
    }
    Profile.quantileIngestBatch(batch, groupCol, valueCol, artifactPath, batchId)
  }

  /** The monitor as a streaming query (AvailableNow drain); the
    * quantile artifact at `artifactPath` must be initialized. */
  def quantileDriftMonitor(rows: DataFrame, groupCol: String, valueCol: String,
                           artifactPath: String, alarmPath: String,
                           checkpoint: String): StreamingQuery =
    rows.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, id, groupCol, valueCol, artifactPath, alarmPath)
      }
      .start()

  /** Every COMMITTED alarm row: (batch `b`, g, psi, status). Only
    * `b=` dirs carrying the `_SUCCESS` marker are read — crash debris
    * from a mid-write batch (the window [[processBatch]]'s replay
    * heals) must neither surface as alarm rows nor crash the read.
    * Schema-stable empty frame before any alarm commits. */
  def readDriftAlarms(spark: SparkSession, alarmPath: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(alarmPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed =
      if (!fs.exists(root)) Array.empty[String]
      else fs.listStatus(root)
        .filter(s => s.getPath.getName.startsWith("b=") &&
          fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))
        .map(_.getPath.toString)
    if (committed.nonEmpty)
      spark.read.option("basePath", alarmPath).parquet(committed: _*)
        .select(col("b").cast("long").as("b"), col("g"), col("psi"), col("status"))
    else
      spark.range(0).select(col("id").as("b"),
        col("id").cast("string").as("g"), col("id").cast("double").as("psi"),
        col("id").cast("string").as("status"))
  }
}
