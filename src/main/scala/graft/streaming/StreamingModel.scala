package graft.streaming

import graft.ml.{ModelArtifact, PricePredictor}
import graft.sources.Sinks
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming daily-bar ingest into a standing history table with a
  * growth-refreshed model artifact — the ML counterpart of
  * [[StreamingGraph]]/[[StreamingLinkIndex]], keeping the family
  * symmetry intact: every standing-state tier (CMS, HLL profile,
  * quantile sketch, additive aggs, postings, vectors, ranks, the
  * linkage catalog, and now the fitted price model) has a micro-batch
  * fold. Each drain merges the batch's (user_id, d) bars into the
  * date-partitioned history (the U1 DO-UPDATE keyed merge — replay of
  * a micro-batch is a row-identical upsert, so at-least-once delivery
  * is a no-op by CONSTRUCTION, the keyed-sink discipline rather than
  * the counting families' fingerprint guard), then lets the model's
  * growth trigger decide whether to refit from the standing history's
  * feature frame ([[graft.ml.ModelArtifact.maybeRefresh]]).
  *
  * Refits happen strictly AFTER the batch commits: a crash between
  * merge and refit leaves the trigger to the next drain, and the
  * served model is always a complete fit over merged history. Scoring
  * readers resolve the versioned `CURRENT` pointer any time —
  * maintenance never makes the serving surface flicker.
  */
object StreamingModel {

  /** One micro-batch: upsert the bars into the history table, then
    * tick the model's growth trigger (`refreshGrowthPct` = None →
    * never refit here; the operator refits on their own schedule). */
  def ingestBars(batch: DataFrame, historyPath: String, modelPath: String,
                 refreshGrowthPct: Option[Int] = None): Unit = {
    Sinks.mergeIntoPartitioned(
      batch.select(col("user_id"), col("d"), col("close"),
        col("high"), col("low")),
      historyPath, Seq("user_id", "d"), "d", doUpdate = true)
    refreshGrowthPct.foreach { p =>
      val spark = batch.sparkSession
      ModelArtifact.maybeRefresh(spark, modelPath,
        PricePredictor.featuresOf(spark.read.parquet(historyPath)), p)
    }
  }

  /** The ingest service as a streaming query: drain the bar stream
    * with AvailableNow, merge each micro-batch, refit when the growth
    * trigger trips. The artifact at `modelPath` must exist
    * ([[graft.ml.ModelArtifact.init]]). */
  def barsIngest(rows: DataFrame, historyPath: String, modelPath: String,
                 checkpoint: String,
                 refreshGrowthPct: Option[Int] = Some(10)): StreamingQuery =
    rows.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBars(batch, historyPath, modelPath, refreshGrowthPct)
      }
      .start()
}
