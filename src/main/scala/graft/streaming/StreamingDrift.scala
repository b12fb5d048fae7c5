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
  * for batch i is written BEFORE the fold, guarded by its own
  * `b=<id>` existence check. An at-least-once redelivery therefore
  * finds the alarm already written (skips it — recomputing would be
  * WRONG: after the fold the artifact includes the batch, so the
  * replayed PSI would differ) and the fold itself fingerprint-skips.
  * A crash between alarm write and fold heals on replay: alarm
  * exists → skipped, fold proceeds. The first batch has nothing to
  * compare against — no alarm row, by design.
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
    // gate on the COMMITTED marker, not bare existence: a crash mid-
    // alarm-write leaves a partial dir but no _SUCCESS, and the fold
    // below hasn't run yet, so the replay's recompute is faithful and
    // the overwrite heals the debris
    if (!fs.exists(new org.apache.hadoop.fs.Path(alarmDir, "_SUCCESS"))) {
      val prior = Profile.readQuantileArtifact(spark, artifactPath)
        .localCheckpoint() // judged state must not move under the fold below
      if (!prior.isEmpty) {
        val sk = Profile.logHistogram(batch.select(col(groupCol), col(valueCol)),
          groupCol, valueCol, mbits)
        Profile.psiFromLogHistograms(prior, sk)
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

  /** Every alarm row logged so far: (batch `b`, g, psi, status).
    * Schema-stable empty frame before any alarm lands. */
  def readDriftAlarms(spark: SparkSession, alarmPath: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(alarmPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root) &&
        fs.listStatus(root).exists(_.getPath.getName.startsWith("b=")))
      spark.read.parquet(alarmPath)
        .select(col("b").cast("long").as("b"), col("g"), col("psi"), col("status"))
    else
      spark.range(0).select(col("id").as("b"),
        col("id").cast("string").as("g"), col("id").cast("double").as("psi"),
        col("id").cast("string").as("status"))
  }
}
