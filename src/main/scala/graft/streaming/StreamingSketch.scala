package graft.streaming

import graft.functions.TextStats
import graft.operators.Profile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming frequency telemetry — the count-min counterpart of
  * [[StreamingPostings]]/[[StreamingVectors]]: an unbounded document
  * stream folds, micro-batch by micro-batch, into the persisted CMS
  * artifact ([[graft.operators.Profile.initCmsArtifact]] layout), so
  * "how often has token X appeared so far" is answerable at any time
  * from depth × width state that never grows with the corpus —
  * the streaming form of the vocabulary/drift telemetry a 100 TB
  * ingest pipeline watches (sudden token-frequency shifts = a new
  * spam campaign, a broken upstream decoder, a language mix change).
  *
  * Replay safety is the COUNTING discipline, not the id-keyed one:
  * counts cannot be anti-joined against "already ingested" (there is
  * no key), so each micro-batch's own sketch lands keyed by batch id
  * with overwrite-in-place — an at-least-once redelivery overwrites
  * itself byte-identically and the serving read's linear fold
  * ([[graft.operators.Profile.readCmsArtifact]]) counts every batch
  * exactly once. StreamingSpec pins streamed ≡ one-shot sketch over
  * the union corpus, replay no-op included.
  */
object StreamingSketch {

  /** One micro-batch: tokenize (doc_id, text) rows and fold the token
    * stream into the artifact under this batch's partition. */
  def ingestTokenBatch(batch: DataFrame, batchId: Long, path: String): Unit =
    Profile.cmsIngestBatch(
      batch.select(explode(TextStats.tokens(col("text"))).as("tok")),
      "tok", path, batchId)

  /** The ingest service as a streaming query: drain the document
    * stream with AvailableNow, fold each micro-batch. The artifact at
    * `path` must exist ([[graft.operators.Profile.initCmsArtifact]]
    * fixes the dimensions every fold is checked against). */
  def tokenFrequencyIngest(docs: DataFrame, path: String,
                           checkpoint: String): StreamingQuery =
    docs.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        ingestTokenBatch(batch, id, path)
      }
      .start()

  /** The distinct-count counterpart: each micro-batch's (group, key)
    * rows land as that batch's HLL sketches in the persisted profile
    * artifact ([[graft.operators.Profile.profileIngestShard]] keyed by
    * batch id — overwrite-in-place, so an at-least-once redelivery is
    * exactly idempotent), and "distinct keys per group so far" serves
    * from a union of kilobyte sketches at any moment. Unlike the CMS
    * fold this is also SAFE under overlap by construction: HLL
    * registers max-fold, so even a key delivered in many batches
    * counts once. */
  def distinctProfileIngest(rows: DataFrame, groupCol: String, keyCol: String,
                            path: String, checkpoint: String): StreamingQuery =
    rows.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        Profile.profileIngestShard(batch, groupCol, keyCol, path, id)
      }
      .start()

  /** The quantile counterpart: each micro-batch's (group, value)
    * rows fold into the persisted log-histogram artifact
    * ([[graft.operators.Profile.quantileIngestBatch]], keyed by batch
    * id — counters, so the replay discipline is the CMS one:
    * fingerprint-guarded overwrite-in-place makes an at-least-once
    * redelivery exactly idempotent), and "p50/p95/p99 of the signal
    * so far" serves from bucket-count state that never grows with
    * the corpus — the latency/length/score telemetry shape. */
  def quantileProfileIngest(rows: DataFrame, groupCol: String, valueCol: String,
                            path: String, checkpoint: String): StreamingQuery =
    rows.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        Profile.quantileIngestBatch(batch, groupCol, valueCol, path, id)
      }
      .start()

  /** The EXACT tier: per-group (count, sum) materialized view folded
    * batch-by-batch ([[graft.operators.Profile.aggIngestBatch]]) —
    * incremental view maintenance as a stream sink. Count and sum are
    * additive, so unlike the sketch folds the served view is exact,
    * with the same overwrite-in-place replay idempotence. */
  def additiveAggIngest(rows: DataFrame, groupCol: String, valueCol: String,
                        path: String, checkpoint: String): StreamingQuery =
    rows.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        Profile.aggIngestBatch(batch, groupCol, valueCol, path, id)
      }
      .start()
}
