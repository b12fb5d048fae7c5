package graft.streaming

import graft.functions.TextStats
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming document dedup — the LLM-corpus dedup operators
  * (operators/Dedup.scala) applied to an UNBOUNDED document stream,
  * the shape a continuous crawl-ingest pipeline needs.
  *
  *  - [[exactFirstWins]]: stateful `dropDuplicates` on the content
  *    fingerprint — checkpointed key state spans micro-batches and
  *    restarts, so a document seen once is suppressed forever. State
  *    is one md5 string per distinct document: ~32 bytes × corpus
  *    cardinality, partitioned by the state store.
  *  - [[exactWithinWatermark]]: `dropDuplicatesWithinWatermark` —
  *    bounded state for feeds where a duplicate can only arrive
  *    within a bounded lateness window (e.g. retried uploads). State
  *    expires past the watermark: the 100 TB-stream-safe variant,
  *    since unbounded distinct-content state eventually exceeds any
  *    store.
  *
  * Near-dup signatures compose the same way: the MinHash/SimHash
  * expressions are per-row (no state), so `sig → groupBy band` runs
  * as a windowed streaming aggregation; the pairwise verify is a
  * batch job over each window's candidates.
  */
object StreamingDedup {

  /** Content fingerprint used as the dedup key (normalized-text md5 —
    * same definition as the batch q_fingerprint). */
  def withFingerprint(stream: DataFrame, textCol: String): DataFrame =
    stream.withColumn("fp", TextStats.fingerprint(col(textCol)))

  /** First-wins exact dedup over the whole stream history. */
  def exactFirstWins(stream: DataFrame, textCol: String): DataFrame =
    withFingerprint(stream, textCol).dropDuplicates("fp")

  /** Exact dedup with state bounded by the event-time watermark:
    * duplicates are only suppressed while their fingerprint state is
    * younger than `delay` — after that the state is dropped. */
  def exactWithinWatermark(stream: DataFrame, textCol: String,
                           tsCol: String, delay: String): DataFrame =
    withFingerprint(stream, textCol)
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("fp")

  /** One micro-batch of the NEAR-dup ingest service — the continuous
    * form of the daily-ingest question ([[Dedup.minhashIncremental]]):
    * each arriving batch is near-dup-checked against the PERSISTED LSH
    * index AND within itself, accepted docs land in the corpus sink
    * and are appended to the index, rejected docs land in an audit
    * sink with their match.
    *
    * Replay safety (foreachBatch is at-least-once — a crashed batch
    * re-runs): both sinks partition by `ingest_batch` and use DYNAMIC
    * partition overwrite, so a replay overwrites its own partition
    * instead of duplicating rows; the index append anti-joins
    * already-indexed ids ([[Dedup.appendToLshIndex]]), so the replayed
    * append is a no-op. Every step is idempotent per batch id —
    * BYTE-idempotent for the sinks: index matches whose corpus_id is
    * a doc_id of the CURRENT batch are excluded wholesale (on a
    * replay the batch's accepted docs are already in the index and
    * would match both themselves and their batch-mates; within-batch
    * relations are `within`'s job), so a replayed partition is
    * row-identical to the original write, not merely equivalent.
    *
    * doc_id contract: ids must be globally unique across the stream's
    * lifetime — the index keys on them. A batch doc that REUSES an
    * already-indexed id with different content is detected (stored
    * sketch ≠ batch sketch) and routed to the rejected sink as
    * via="id_collision" (jaccard null) rather than silently accepted
    * without ever being indexed, which would hide all its future
    * near-dups.
    *
    * Within-batch policy: the smaller doc_id of a verified pair wins
    * (greedy min-id, the ingest-time convention — full quality-based
    * survivor selection is the batch job, [[Dedup.survivors]]); a doc
    * whose within-batch keeper is itself rejected against the corpus
    * is also rejected, the conservative choice for training data. */
  def ingestNearDupBatch(batch: DataFrame, batchId: Long, indexPath: String,
                         acceptedPath: String, rejectedPath: String,
                         shingleK: Int = 3, bands: Int = 16,
                         rowsPerBand: Int = 4,
                         threshold: Double = 0.5,
                         groupStatePath: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    // pin: the batch feeds the index probe, the self-join, and the
    // accepted/rejected splits — one tokenize+hash pass, not four
    val b = batch.dropDuplicates("doc_id").localCheckpoint()
    val batchIds = b.select(col("doc_id").as("corpus_id"))
    val vsIndex = Dedup
      .minhashIncrementalIndexed(b, indexPath, shingleK, bands, rowsPerBand, threshold)
      .join(batchIds, Seq("corpus_id"), "left_anti")
      .select(col("doc_id"), col("corpus_id").as("matched_id"),
        col("jaccard"), lit("index").as("via"))
    val within = Dedup.minhashPairs(b, shingleK, bands, rowsPerBand, threshold)
      .select(col("doc_b").as("doc_id"), col("doc_a").as("matched_id"),
        col("jaccard"), lit("batch").as("via"))
    // id-collision audit: already-indexed id, different stored sketch.
    // Join keyed on the id (selective — reads only colliding ids'
    // sketch rows); a replayed doc's sketch matches its own stored row,
    // so replays produce zero collision rows, preserving idempotence.
    val collisions = Dedup.withShingleHashSet(b, shingleK)
      .join(spark.read.parquet(s"$indexPath/sketches"),
        col("doc_id") === col("corpus_id"))
      .filter(col("sh") =!= col("sh_c"))
      .select(col("doc_id"), col("doc_id").as("matched_id"),
        lit(null).cast("double").as("jaccard"), lit("id_collision").as("via"))
    val rejected = vsIndex.unionByName(within).unionByName(collisions).localCheckpoint()
    val rejIds = rejected.select("doc_id").distinct()
    val accepted = b.join(rejIds, Seq("doc_id"), "left_anti").localCheckpoint()
    accepted.withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch").parquet(acceptedPath)
    rejected.withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch").parquet(rejectedPath)
    Dedup.appendToLshIndex(accepted, indexPath, shingleK, bands, rowsPerBand)
    // duplicate-GROUP state fold: the batch's verified near-dup EDGES
    // (index matches + within-batch pairs; id collisions are audit
    // rows, not similarity edges) merge into the persisted component
    // state — rounds ∝ batch, bucket-pruned relabels
    // (Dedup.mergeComponentState), so group assignment keeps pace with
    // ingest instead of waiting for a global CC batch job. A replayed
    // batch re-presents the same edges and the merge no-ops.
    groupStatePath.foreach { sp =>
      Dedup.mergeComponentState(
        rejected.filter(col("via") =!= "id_collision")
          .select(col("doc_id"), col("matched_id")), sp)
    }
  }

  /** The ingest service as a streaming query: drain the document
    * stream with AvailableNow, run [[ingestNearDupBatch]] per
    * micro-batch. The index at `indexPath` must exist
    * ([[Dedup.buildLshIndex]], possibly over an empty seed corpus). */
  def nearDupIngest(docs: DataFrame, indexPath: String, acceptedPath: String,
                    rejectedPath: String, checkpoint: String,
                    shingleK: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
                    threshold: Double = 0.5,
                    groupStatePath: Option[String] = None): StreamingQuery =
    docs.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        ingestNearDupBatch(batch, id, indexPath, acceptedPath, rejectedPath,
          shingleK, bands, rowsPerBand, threshold, groupStatePath)
      }
      .start()
}
