package graft.streaming

import graft.operators.FuzzyLinkIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming catalog ingest into the persisted fuzzy-link index — the
  * record-linkage counterpart of [[StreamingGraph]], keeping the
  * family symmetry intact: every standing-state tier (CMS, HLL
  * profile, quantile sketch, additive aggs, postings, vectors, ranks,
  * and now the linkage catalog) has a micro-batch fold. A canonical
  * catalog's growth stream (new products, titles, entity names) lands
  * batch-by-batch under the artifact's fingerprint replay guard, and
  * the gram/frequency/prefix index derives FROM that standing state —
  * either on demand ([[FuzzyLinkIndex.refreshLinkIndex]]) or through
  * the growth trigger folded into the drain here, so inbound dirty
  * batches always resolve against an index at most one growth bound
  * behind the catalog.
  *
  * Replay safety is the counting-family discipline: a micro-batch's
  * distinct (id, s) rows land keyed by batch id, an at-least-once
  * redelivery is fingerprint-identical and skipped, a reset
  * checkpoint re-using a batch id with DIFFERENT rows fails loudly
  * ([[graft.operators.Profile.landBatchPart]] semantics), and two
  * batches claiming one id with different strings fail at refresh
  * (the catalog-is-a-function guard). Index refreshes happen strictly
  * AFTER the batch commits, so a crash between land and refresh just
  * leaves the trigger to the next drain — the served version is
  * always a complete derivation over committed batches.
  */
object StreamingLinkIndex {

  /** One micro-batch: land the batch's (id, s) rows as a committed
    * catalog batch, then let the growth trigger decide whether the
    * index re-derives (`refreshGrowthPct` = None → never refresh
    * here; the operator refreshes on their own schedule). */
  def ingestCatalogBatch(batch: DataFrame, batchId: Long, indexPath: String,
                         refreshGrowthPct: Option[Int] = None): Unit = {
    FuzzyLinkIndex.ingestCatalogBatch(
      batch.select(col("id"), col("s")), indexPath, batchId)
    refreshGrowthPct.foreach(p =>
      FuzzyLinkIndex.maybeRefreshLinkIndex(batch.sparkSession, indexPath, p))
  }

  /** The ingest service as a streaming query: drain the catalog
    * stream with AvailableNow, fold each micro-batch, re-derive the
    * index when the growth trigger trips. The artifact at `indexPath`
    * must exist ([[FuzzyLinkIndex.initLinkIndex]] pins k/q). */
  def catalogIngest(rows: DataFrame, indexPath: String, checkpoint: String,
                    refreshGrowthPct: Option[Int] = Some(10)): StreamingQuery =
    rows.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        ingestCatalogBatch(batch, id, indexPath, refreshGrowthPct)
      }
      .start()
}
