package graft.streaming

import graft.operators.KeywordSearch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming LEXICAL ingest — the postings-index counterpart of
  * [[StreamingVectors]], closing the last index family without a
  * streaming maintenance path: an unbounded document stream
  * (doc_id, text) drains micro-batch by micro-batch into the durable
  * document sink AND the persisted inverted index
  * ([[KeywordSearch.buildInvertedIndex]] layout), so BM25 probes
  * ([[KeywordSearch.bm25TopKIndexed]]) always see the corpus as of
  * the last committed batch without any rebuild.
  *
  * Replay safety (foreachBatch is at-least-once): the doc sink
  * partitions by `ingest_batch` with DYNAMIC partition overwrite, so
  * a replay overwrites its own partition; the index side is
  * [[KeywordSearch.ingestIntoInvertedIndex]] — anti-join against
  * already-indexed doc_ids plus the one-marker staged commit, so a
  * replayed (or crashed-and-retried) batch can neither double-count a
  * document nor leave postings/dfreq/stats disagreeing. Within-batch
  * duplicate doc_ids collapse to a deterministic max-fingerprint
  * survivor before either write, the [[StreamingVectors]] convention.
  * doc_ids must be globally unique across the stream's lifetime — the
  * index keys on them (route near-dups through [[StreamingDedup]]
  * first).
  *
  * Batch schema contract: batches are (doc_id, text) ONLY — the
  * survivor groupBy projects exactly those two, so extra columns a
  * caller smuggles in are dropped from the durable sink by design.
  */
object StreamingPostings {

  /** One micro-batch: land the (deduplicated) docs in the
    * batch-partitioned sink, then fold them into the inverted index.
    * Sink first — a crash between the writes leaves the document
    * durable and the retry heals the index, never the reverse (an
    * indexed doc missing from the sink would survive no rebuild). */
  def ingestDocBatch(batch: DataFrame, batchId: Long, indexPath: String,
                     docsPath: String): Unit = {
    val b = batch
      .groupBy(col("doc_id"))
      .agg(max_by(col("text"), xxhash64(col("doc_id"), col("text"))).as("text"))
      .localCheckpoint()
    b.withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch").parquet(docsPath)
    KeywordSearch.ingestIntoInvertedIndex(b, indexPath)
  }

  /** The ingest service as a streaming query: drain the document
    * stream with AvailableNow, run [[ingestDocBatch]] per
    * micro-batch. The index at `indexPath` must exist
    * ([[KeywordSearch.buildInvertedIndex]] over a seed corpus fixes
    * the term-bucket count the stream folds into). */
  def docIngest(docs: DataFrame, indexPath: String, docsPath: String,
                checkpoint: String): StreamingQuery =
    docs.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        ingestDocBatch(batch, id, indexPath, docsPath)
      }
      .start()
}
