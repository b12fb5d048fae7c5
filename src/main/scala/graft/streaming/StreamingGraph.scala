package graft.streaming

import graft.operators.GraphArtifact
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming edge ingest into the persisted rank artifact — the graph
  * counterpart of [[StreamingSketch]]/[[StreamingPostings]], closing
  * the family symmetry: every standing-state tier (CMS, HLL profile,
  * quantile sketch, additive aggs, postings, vectors, ranks) now has
  * a micro-batch fold. A crawl's link stream lands batch-by-batch
  * under the artifact's fingerprint replay guard, and authority ranks
  * refresh FROM that standing state — never from raw crawl text —
  * either on demand ([[GraphArtifact.refreshRanks]]) or through the
  * growth trigger folded into the drain here.
  *
  * Replay safety is the counting-family discipline: a micro-batch's
  * COLLAPSED edge set lands keyed by batch id, an at-least-once
  * redelivery is fingerprint-identical and skipped, a reset
  * checkpoint re-using a batch id with DIFFERENT edges fails loudly
  * ([[graft.operators.Profile.landBatchPart]] semantics). Rank
  * refreshes happen strictly AFTER the batch commits, so a crash
  * between land and refresh just leaves the trigger to the next
  * drain — the served version is always a complete sweep of
  * committed batches.
  */
object StreamingGraph {

  /** One micro-batch: land the batch's (src, dst) rows as a committed
    * edge batch, then let the growth trigger decide whether the ranks
    * re-sweep (`refreshGrowthPct` = None → never refresh here; the
    * operator refreshes on their own schedule). */
  def ingestEdgeBatch(batch: DataFrame, batchId: Long, artifactPath: String,
                      refreshGrowthPct: Option[Int] = None): Unit = {
    GraphArtifact.ingestEdgeBatch(
      batch.select(col("src"), col("dst")), artifactPath, batchId)
    refreshGrowthPct.foreach(p =>
      GraphArtifact.maybeRefreshRanks(batch.sparkSession, artifactPath, p))
  }

  /** The ingest service as a streaming query: drain the edge stream
    * with AvailableNow, fold each micro-batch, refresh ranks when the
    * growth trigger trips. The artifact at `artifactPath` must exist
    * ([[GraphArtifact.initRankArtifact]] pins iters/scale). */
  def edgeIngest(edges: DataFrame, artifactPath: String, checkpoint: String,
                 refreshGrowthPct: Option[Int] = Some(10)): StreamingQuery =
    edges.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        ingestEdgeBatch(batch, id, artifactPath, refreshGrowthPct)
      }
      .start()
}
